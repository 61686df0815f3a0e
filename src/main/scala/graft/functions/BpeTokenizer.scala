package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Frozen BPE vocabulary — fit ONCE offline by
  * [[graft.tools.FitBpeVocab]] (classic byte-pair merges, Sennrich et
  * al. 2016, over the sf0.01 word-frequency dictionary) and committed
  * as constants, the same frozen-artifact pattern as `IvfCodebook`
  * and the minhash permutations: the Spark kernel and the DuckDB
  * oracle replay the identical token set with zero runtime fitting.
  * Ids are array positions. The single-char base alphabet (ids
  * 0..55) is fixed independent of the corpus so a regenerated corpus
  * degrades to more single-char tokens / UNKs, never a crash. */
object BpeVocab {
  // 89 merges fit on /root/testdata/sf0.01; vocab size 144
  val tokens: Array[String] = Array(
    "a", "b", "c", "d", "e", "f", "g", "h",
    "i", "j", "k", "l", "m", "n", "o", "p",
    "q", "r", "s", "t", "u", "v", "w", "x",
    "y", "z", "0", "1", "2", "3", "4", "5",
    "6", "7", "8", "9", ".", ",", ";", ":",
    "!", "?", "@", "#", "&", "%", "*", "(",
    ")", "-", "_", "+", "=", "/", "'", "er",
    "in", "ow", "or", "st", "mer", "at", "lu", "ar",
    "par", "jo", "join", "as", "ash", "hash", "row", "atc",
    "atch", "batch", "an", "can", "scan", "co", "cu", "colu",
    "colum", "column", "cust", "custo", "customer", "fi", "fil", "filt",
    "filter", "al", "all", "mall", "small", "ge", "low", "merge",
    "slow", "ct", "ctor", "der", "ector", "order", "vector", "ine",
    "line", "ab", "abl", "able", "ata", "data", "table", "up",
    "ag", "agg", "alu", "alue", "value", "ey", "key", "am",
    "eam", "ream", "stream", "dow", "indow", "window", "park", "spark",
    "gr", "gro", "group", "part", "bi", "big", "ort", "sort",
    "ery", "qu", "query", "ast", "fast", "he", "the", "dup"
  )
}

/** JVM-side maximal-munch encoder against [[BpeVocab]]: per word
  * (maximal non-whitespace run), repeatedly take the LONGEST vocab
  * token prefixing the remainder; a character no vocab entry covers
  * encodes as UNK (-1) and consumes one char. One pass, zero regex,
  * zero allocation beyond the output buffer — the per-row kernel
  * behind the codegen'd [[BpeTokenIds]]. */
object BpeTokenize {
  private val maxLen: Int = BpeVocab.tokens.iterator.map(_.length).max
  private val idOf: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](BpeVocab.tokens.length * 2)
    var i = 0
    while (i < BpeVocab.tokens.length) { m.put(BpeVocab.tokens(i), i); i += 1 }
    m
  }

  def encode(text: String): Array[Int] = {
    val out = new scala.collection.mutable.ArrayBuilder.ofInt
    out.sizeHint(text.length / 4)
    val n = text.length
    var i = 0
    while (i < n) {
      if (Character.isWhitespace(text.charAt(i))) i += 1
      else {
        var end = i
        while (end < n && !Character.isWhitespace(text.charAt(end))) end += 1
        var p = i
        while (p < end) {
          var l = math.min(maxLen, end - p)
          var id = -1
          while (l >= 1 && id == -1) {
            val cand = idOf.get(text.substring(p, p + l))
            if (cand ne null) id = cand.intValue() else l -= 1
          }
          if (id == -1) { out += -1; p += 1 } else { out += id; p += l }
        }
        i = end
      }
    }
    out.result()
  }
}

/** Catalyst expression: BPE token ids (array<int>) of a string column
  * against the frozen [[BpeVocab]], whole-stage-codegen'd — the (b)
  * custom-Expression tier. Tokenization is the highest-frequency
  * LLM-pipeline primitive; at 100 TB this runs as one map-only fused
  * loop per document with no shuffle, no UDF boxing, no HOF
  * interpretation. UNK is -1. */
case class BpeTokenIds(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "bpe_token_ids"

  override def nullSafeEval(a: Any): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      BpeTokenize.encode(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.functions.BpeTokenize.encode($s.toString()));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
