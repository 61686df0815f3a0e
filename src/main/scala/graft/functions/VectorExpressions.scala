package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, IntegerType, LongType, StringType}

/** Native Catalyst expression for cosine similarity over two
  * array<double> columns, with full whole-stage-codegen support
  * (doGenCode emits a fused primitive loop — no boxing, no
  * higher-order-function interpretation). This is the (b)-tier
  * custom-operator path from the build guidance: a scalar Expression
  * beats a Scala UDF, which beats interpreted HOF chains, for
  * per-row vector math in the 100 TB hot path.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $x.getDouble($i);
         |  double $yi = $y.getDouble($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
         |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Asymmetric cosine against int8-quantized codes: query stays
  * full-precision array<double>, corpus side is array<tinyint> SQ8
  * codes (code_i = round(x_i / scale)). The per-vector scale CANCELS
  * in cosine — cos(q, scale·c) = Σq_i·c_i / (|q|·|c|) — so the
  * serving scan needs ONLY the 1-byte codes, never the scale or the
  * original floats: the memory-bounded vector-serving trick behind
  * IVF-SQ8 (Jégou et al. 2011's asymmetric distance computation,
  * scalar-quantizer variant). Same fused codegen loop as
  * [[CosineSimilarity]]. */
case class CosineInt8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ByteType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<tinyint>), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_int8"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getByte(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $x.getDouble($i);
         |  double $yi = (double) $y.getByte($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
         |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Count of common elements between two SORTED array<long> columns —
  * a codegen'd linear merge loop. Replaces `size(array_intersect(…))`
  * (hash-set build per row) in the dedup verification hot path, where
  * shingle arrays are already produced by sort_array. Inputs must be
  * strictly sorted ascending with distinct elements (array_distinct +
  * sort_array), which the dedup operators guarantee. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0L
    val nx = x.numElements(); val ny = y.numElements()
    while (i < nx && j < ny) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { c += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yj = ctx.freshName("yj")
      val c = ctx.freshName("c")
      s"""
         |int $i = 0; int $j = 0; long $c = 0L;
         |int $nx = $x.numElements(); int $ny = $y.numElements();
         |while ($i < $nx && $j < $ny) {
         |  long $xi = $x.getLong($i); long $yj = $y.getLong($j);
         |  if ($xi == $yj) { $c++; $i++; $j++; }
         |  else if ($xi < $yj) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All byte-window n-gram hashes of a string in ONE O(len) pass — a
  * polynomial rolling hash (base 1000003, natural 2^64 wrap) instead
  * of the O(len·n) `transform(sequence(...), i -> xxhash64(substring
  * (text, i, n)))` chain, which re-slices and re-hashes n bytes per
  * position. Used by shingle-equality operators (decontamination)
  * where ANY deterministic hash works; byte windows equal char
  * windows on ASCII corpora (normalize multibyte text first).
  * Emits `len <= n` → one hash of the whole string, else
  * `len - n + 1` window hashes, mirroring the substring-based
  * formulation's position count. */
case class NgramHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) =>
        if (!right.foldable)
          TypeCheckResult.TypeCheckFailure(s"$prettyName requires a literal window size")
        else right.eval() match {
          case n: Integer if n >= 1 => TypeCheckResult.TypeCheckSuccess
          case other => TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires window size >= 1, got $other")
        }
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val bytes = a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val n = b.asInstanceOf[Int]
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(NgramHashes.hashes(bytes, n))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, nn) => {
      val bytes = ctx.freshName("bytes"); val len = ctx.freshName("len")
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val pow = ctx.freshName("pow"); val h = ctx.freshName("h")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      s"""
         |byte[] $bytes = $s.getBytes();
         |int $len = $bytes.length;
         |int $n = $nn;
         |long[] $out;
         |if ($len <= $n) {
         |  long $h = 0L;
         |  for (int $j = 0; $j < $len; $j++) { $h = $h * 1000003L + ($bytes[$j] & 0xff); }
         |  $out = new long[]{$h};
         |} else {
         |  $out = new long[$len - $n + 1];
         |  long $pow = 1L;
         |  for (int $j = 0; $j < $n - 1; $j++) { $pow *= 1000003L; }
         |  long $h = 0L;
         |  for (int $j = 0; $j < $n; $j++) { $h = $h * 1000003L + ($bytes[$j] & 0xff); }
         |  $out[0] = $h;
         |  for (int $i = 1; $i <= $len - $n; $i++) {
         |    $h = ($h - ($bytes[$i - 1] & 0xff) * $pow) * 1000003L + ($bytes[$i + $n - 1] & 0xff);
         |    $out[$i] = $h;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NgramHashes {
  private[functions] def hashes(bytes: Array[Byte], n: Int): Array[Long] = {
    val len = bytes.length
    val B = 1000003L
    if (len <= n) {
      var h = 0L; var j = 0
      while (j < len) { h = h * B + (bytes(j) & 0xff); j += 1 }
      Array(h)
    } else {
      val out = new Array[Long](len - n + 1)
      var pow = 1L; var j = 0
      while (j < n - 1) { pow *= B; j += 1 }
      var h = 0L; j = 0
      while (j < n) { h = h * B + (bytes(j) & 0xff); j += 1 }
      out(0) = h
      var i = 1
      while (i <= len - n) {
        h = (h - (bytes(i - 1) & 0xff) * pow) * B + (bytes(i + n - 1) & 0xff)
        out(i) = h
        i += 1
      }
      out
    }
  }
}

/** All CODE-POINT-window n-gram hashes of a string in one O(len)
  * pass — the multi-byte-safe sibling of [[NgramHashes]]: windows are
  * n Unicode code points (not n bytes) and offsets are code-point
  * offsets, so downstream `substr`-based cutting (SQL substr counts
  * code points in both Spark and DuckDB) is exact on any UTF-8 text,
  * not just ASCII. The rolling polynomial hash runs over code-point
  * values with the same base (1000003, natural 2^64 wrap), so on
  * pure-ASCII input — where code point == byte — the emitted hashes
  * are bit-identical to [[NgramHashes]]: ASCII corpora keep their
  * published fingerprints. Emits `cpLen <= n` → one hash of the whole
  * string, else `cpLen - n + 1` window hashes. The UTF-8 decode is a
  * single forward scan (truncated/malformed tails degrade to
  * byte-value code points rather than throwing — Spark strings are
  * valid UTF-8, so this is a never-reached safety rail). */
case class NgramHashesChars(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) =>
        if (!right.foldable)
          TypeCheckResult.TypeCheckFailure(s"$prettyName requires a literal window size")
        else right.eval() match {
          case n: Integer if n >= 1 => TypeCheckResult.TypeCheckSuccess
          case other => TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires window size >= 1, got $other")
        }
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes_chars"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val bytes = a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(NgramHashesChars.hashes(bytes, b.asInstanceOf[Int]))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, nn) =>
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.functions.NgramHashesChars.hashes($s.getBytes(), $nn));
       """.stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NgramHashesChars {
  /** UTF-8 bytes → code-point array, single forward scan. */
  private[functions] def codePoints(bytes: Array[Byte]): Array[Int] = {
    val len = bytes.length
    val out = new Array[Int](len) // upper bound; trimmed below
    var i = 0; var m = 0
    while (i < len) {
      val b = bytes(i) & 0xff
      var cp = b; var sz = 1
      if (b >= 0x80) {
        if ((b & 0xe0) == 0xc0) { cp = b & 0x1f; sz = 2 }
        else if ((b & 0xf0) == 0xe0) { cp = b & 0x0f; sz = 3 }
        else if ((b & 0xf8) == 0xf0) { cp = b & 0x07; sz = 4 }
        if (i + sz <= len) {
          var k = 1
          while (k < sz) { cp = (cp << 6) | (bytes(i + k) & 0x3f); k += 1 }
        } else { cp = b; sz = 1 } // malformed tail: byte-value fallback
      }
      out(m) = cp; m += 1; i += sz
    }
    if (m == len) out else java.util.Arrays.copyOf(out, m)
  }

  def hashes(bytes: Array[Byte], n: Int): Array[Long] = {
    val cps = codePoints(bytes)
    val len = cps.length
    val B = 1000003L
    if (len <= n) {
      var h = 0L; var j = 0
      while (j < len) { h = h * B + cps(j); j += 1 }
      Array(h)
    } else {
      val out = new Array[Long](len - n + 1)
      var pow = 1L; var j = 0
      while (j < n - 1) { pow *= B; j += 1 }
      var h = 0L; j = 0
      while (j < n) { h = h * B + cps(j); j += 1 }
      out(0) = h
      var i = 1
      while (i <= len - n) {
        h = (h - cps(i - 1) * pow) * B + cps(i + n - 1)
        out(i) = h
        i += 1
      }
      out
    }
  }
}

/** All byte-window n-gram hashes on the ORACLE-REPRODUCIBLE md5-60
  * family, one kernel pass per row — the codegen'd replacement for
  * `transform(sequence(...), i -> conv(substring(md5(substr(text, i,
  * n)), 1, 15), 16, 10))`: that HOF chain is interpreted (higher-order
  * lambdas never codegen), re-runs the inner `lower()`/substr per
  * position, and allocates a digest per call. Byte windows equal char
  * windows on ASCII corpora (same caveat as [[NgramHashes]]); the md5
  * runs on a reused ThreadLocal digest over the in-place byte slice.
  * Emits `len <= n` → one hash of the whole string, else `len - n + 1`
  * window hashes — mirroring the substring formulation's position
  * count, so the DuckDB oracle replays it bit-for-bit. */
case class Md5NgramHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) =>
        if (!right.foldable)
          TypeCheckResult.TypeCheckFailure(s"$prettyName requires a literal window size")
        else right.eval() match {
          case n: Integer if n >= 1 => TypeCheckResult.TypeCheckSuccess
          case other => TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires window size >= 1, got $other")
        }
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_ngram_hashes"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val bytes = a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Md5NgramHashes.hashes(bytes, b.asInstanceOf[Int]))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, nn) =>
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.functions.Md5NgramHashes.hashes($s.getBytes(), $nn));
       """.stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Md5NgramHashes {
  def hashes(bytes: Array[Byte], n: Int): Array[Long] = {
    val len = bytes.length
    if (len <= n) Array(SimhashKernel.hash60Slice(bytes, 0, len))
    else {
      val out = new Array[Long](len - n + 1)
      var i = 0
      while (i <= len - n) {
        out(i) = SimhashKernel.hash60Slice(bytes, i, n)
        i += 1
      }
      out
    }
  }
}

/** Distinct sliding-window-of-`w` minima of an array<long> column —
  * the winnow SELECTION step as one monotonic-deque pass (O(m) total)
  * instead of `transform(sequence(...), i -> array_min(slice(hs, i+1,
  * w)))` (interpreted, O(m·w), one slice allocation per window — at
  * sf0.1 that HOF step alone held `text_winnow` at 1.8 s in a single
  * task). Output order is first occurrence in window order, matching
  * `array_distinct` over the per-window minima sequence; windows are
  * the `m − w + 1` full slices (one whole-array window when m < w),
  * exactly the `sequence(0, greatest(m − w, 0))` slice family. */
case class WinnowMinima(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType) =>
        if (!right.foldable)
          TypeCheckResult.TypeCheckFailure(s"$prettyName requires a literal window size")
        else right.eval() match {
          case w: Integer if w >= 1 => TypeCheckResult.TypeCheckSuccess
          case other => TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires window size >= 1, got $other")
        }
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, int), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_minima"

  override def nullSafeEval(a: Any, b: Any): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      WinnowMinima.minima(a.asInstanceOf[ArrayData], b.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, w) =>
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.functions.WinnowMinima.minima($h, $w));
       """.stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object WinnowMinima {
  def minima(h: ArrayData, w: Int): Array[Long] = {
    val m = h.numElements()
    if (m == 0) return Array.empty[Long]
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (m <= w) {
      var mn = h.getLong(0)
      var i = 1
      while (i < m) { val v = h.getLong(i); if (v < mn) mn = v; i += 1 }
      seen.add(mn)
    } else {
      // monotonic deque of candidate indices; ties pop the earlier
      // index, which leaves the same minimum VALUE per window — the
      // only thing the distinct set observes
      val dq = new Array[Int](m)
      var head = 0; var tail = 0
      var i = 0
      while (i < m) {
        val v = h.getLong(i)
        while (tail > head && h.getLong(dq(tail - 1)) >= v) tail -= 1
        dq(tail) = i; tail += 1
        if (dq(head) <= i - w) head += 1
        if (i >= w - 1) seen.add(h.getLong(dq(head)))
        i += 1
      }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }
}

/** The full minhash signature of a shingle-hash array in ONE map-side
  * pass — `numPerms` running minima of `(h % p · a_i + b_i) % p` over
  * the array, with the same splitmix permutation constants
  * ([[graft.operators.Dedup.perm]]) and Mersenne31 modulus as the
  * aggregate formulation, so the two paths are value-identical
  * (property-spec'd). Replacing `explode + numPerms min-aggregates`
  * with this expression removes the signature-construction SHUFFLE
  * entirely: at 100 TB signatures become part of the document scan
  * instead of a corpus-wide groupBy(doc_id). Empty and all-null
  * arrays (which the shingle expressions never produce, but SQL
  * callers can) yield NULL — matching the explode+min twin, whose
  * aggregate has no surviving row for such a document; a sentinel
  * signature here would be a SQL-reachable divergence between the
  * two formulations. */
case class MinhashSignature(left: Expression, right: Expression)
    extends BinaryExpression {

  // NULL on empty/all-null input even when both children are non-null
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType) =>
        if (!right.foldable)
          TypeCheckResult.TypeCheckFailure(s"$prettyName requires a literal permutation count")
        else right.eval() match {
          case n: Integer if n >= 1 => TypeCheckResult.TypeCheckSuccess
          case other => TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires permutation count >= 1, got $other")
        }
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, int), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  @transient private lazy val numPerms: Int = right.eval().asInstanceOf[Int]
  @transient private lazy val permA: Array[Long] =
    Array.tabulate(numPerms)(i => graft.operators.Dedup.perm(i)._1)
  @transient private lazy val permB: Array[Long] =
    Array.tabulate(numPerms)(i => graft.operators.Dedup.perm(i)._2)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val p = MinhashSignature.P
    val out = Array.fill(numPerms)(p)
    val n = x.numElements()
    var voters = 0
    var i = 0
    while (i < n) {
      // Null slots are skipped, matching the explode+min aggregate
      // formulation (min ignores nulls) — SQL-registered callers can
      // pass containsNull arrays.
      if (!x.isNullAt(i)) {
        voters += 1
        var hm = x.getLong(i) % p
        if (hm < 0) hm += p // pmod semantics for negative hash families
        var k = 0
        while (k < numPerms) {
          val v = (hm * permA(k) + permB(k)) % p
          if (v < out(k)) out(k) = v
          k += 1
        }
      }
      i += 1
    }
    if (voters == 0) null
    else org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashPermA", permA, "long[]")
    val bRef = ctx.addReferenceObj("minhashPermB", permB, "long[]")
    nullSafeCodeGen(ctx, ev, (x, _) => {
      val out = ctx.freshName("out"); val i = ctx.freshName("i")
      val k = ctx.freshName("k"); val hm = ctx.freshName("hm")
      val v = ctx.freshName("v"); val n = ctx.freshName("n")
      val voters = ctx.freshName("voters")
      val p = MinhashSignature.P
      s"""
         |long[] $out = new long[$numPerms];
         |java.util.Arrays.fill($out, ${p}L);
         |int $n = $x.numElements();
         |int $voters = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i)) continue; // min ignores nulls
         |  $voters++;
         |  long $hm = $x.getLong($i) % ${p}L;
         |  if ($hm < 0) $hm += ${p}L;
         |  for (int $k = 0; $k < $numPerms; $k++) {
         |    long $v = ($hm * $aRef[$k] + $bRef[$k]) % ${p}L;
         |    if ($v < $out[$k]) $out[$k] = $v;
         |  }
         |}
         |if ($voters == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MinhashSignature {
  /** Mersenne31 — matches [[graft.operators.Dedup.MersennePrime]]. */
  val P: Long = (1L << 31) - 1
}

/** 64-bit SimHash of a token array in ONE map-side pass: each token's
  * md5-60 hash (identical to the SQL `md5Hash60` family the DuckDB
  * oracles replicate) votes per bit; bit b of the result is set iff
  * more than half the tokens have bit b set. Replaces explode +
  * md5 + 64 conditional-count aggregates — the whole per-document
  * token shuffle disappears and the simhash becomes part of the
  * document scan. Codegen calls the [[SimhashKernel]] static (the
  * md5 work dominates, so a fused loop buys nothing over the JVM
  * kernel). Empty arrays yield 0 — callers preserving the explode
  * path's drop-empty semantics filter first. */
case class Simhash64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(a: Any): Any =
    SimhashKernel.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.SimhashKernel.compute($x)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** JVM kernel for [[Simhash64]] — standalone object so the mirror
  * class exposes a true static for generated code. */
object SimhashKernel {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(token) as a nonnegative long — bit-identical
    * to `cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint)`. */
  def hash60(bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(bytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (dig(i) & 0xffL); i += 1 }
    h >>> 4
  }

  /** [[hash60]] over a byte slice — the window form, digesting
    * in-place so the n-gram scan below never copies a window. */
  def hash60Slice(bytes: Array[Byte], off: Int, len: Int): Long = {
    val d = md.get()
    d.reset()
    d.update(bytes, off, len)
    val dig = d.digest()
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (dig(i) & 0xffL); i += 1 }
    h >>> 4
  }

  def compute(a: ArrayData): Long = {
    val n = a.numElements()
    val cnt = new Array[Int](64)
    var voters = 0 // non-null tokens only — the aggregate twin's count()
    var i = 0
    while (i < n) {
      // Null tokens are skipped (and excluded from the majority
      // denominator), matching the explode path where md5(null) is
      // null and conditional counts ignore it. SQL-registered callers
      // can pass containsNull arrays.
      if (!a.isNullAt(i)) {
        val h = hash60(a.getUTF8String(i).getBytes)
        var b = 0
        while (b < 60) { // md5-60 hashes never set bits 60-63
          if (((h >>> b) & 1L) == 1L) cnt(b) += 1
          b += 1
        }
        voters += 1
      }
      i += 1
    }
    var sh = 0L
    var b = 0
    while (b < 64) {
      if (cnt(b) * 2 > voters) sh |= 1L << b
      b += 1
    }
    sh
  }
}

/** Frozen-weight quality-classifier LOGIT of a gram array — the
  * whole `pipe_classifier_quality` scoring pipeline in one JVM kernel
  * call: md5-60 bucket each gram (mod [[graft.operators.QualityWeights.D]]),
  * dedupe, SORT ascending, left-fold bias + Σ W(bucket). The
  * Catalyst-expression formulation (`transform` + `conv(substring(
  * md5(...)))` + interpreted `aggregate` HOF over a 2048-double
  * literal) measured ~2.2 s of the 3.2 s sf0.1 line; this is one
  * static call inside the document scan. Arithmetic is BIT-IDENTICAL
  * to the HOF fold and to the DuckDB oracle: the same sorted-distinct
  * bucket order, the same double adds ([[SimhashKernel.hash60]] ≡
  * `conv(substring(md5(g),1,15),16,10)`), so the hash-verified
  * contract is untouched. Weights are the [[graft.operators
  * .QualityWeights]] constants — the frozen-model discipline
  * (PqCodebook) extended to the expression layer. Null grams are
  * impossible from the builder (concat of non-null token/structural
  * arrays) but skipped defensively, matching md5(null) = null
  * semantics. */
case class QualityScore(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "quality_score"

  override def nullSafeEval(a: Any): Any =
    QualityScoreKernel.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.QualityScoreKernel.compute($x)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** JVM kernel for [[QualityScore]] (static for generated code). */
object QualityScoreKernel {
  def compute(a: ArrayData): Double = {
    val n = a.numElements()
    val buckets = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        buckets(m) = SimhashKernel.hash60(a.getUTF8String(i).getBytes) %
          graft.operators.QualityWeights.D
        m += 1
      }
      i += 1
    }
    java.util.Arrays.sort(buckets, 0, m)
    // ascending-distinct fold — the same add sequence as the HOF
    // aggregate over array_sort(array_distinct(...)) and the oracle's
    // list_reduce over list_sort(list_distinct(...))
    var acc = graft.operators.QualityWeights.Bias
    var prev = -1L
    i = 0
    while (i < m) {
      val b = buckets(i)
      if (b != prev) { acc += graft.operators.QualityWeights.W(b.toInt); prev = b }
      i += 1
    }
    acc
  }
}

/** Sign-LSH home bucket of an array<double> vector: one bit per
  * hyperplane (sign of the dot product — equivalently of the cosine,
  * since the norms are positive), packed into a long. The planes ride
  * along as a codegen reference object instead of `numPlanes × dim`
  * plan literals — at the corpus-adaptive plane counts the literal
  * formulation ballooned task binaries to 8.8 MiB and codegen'd
  * megabyte-scale methods; this is one array lookup. */
case class LshBucket(child: Expression, planes: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"

  @transient private lazy val dim: Int = if (planes.isEmpty) 0 else planes(0).length
  @transient private lazy val flat: Array[Double] = planes.flatten

  override def nullSafeEval(a: Any): Any =
    LshKernel.bucket(a.asInstanceOf[ArrayData], flat, planes.length, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("lshPlanesFlat", flat, "double[]")
    defineCodeGen(ctx, ev, x =>
      s"graft.functions.LshKernel.bucket($x, $pRef, ${planes.length}, $dim)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MARGIN-GUIDED multi-probe set (Lv et al., "Multi-Probe LSH") as ONE
  * fused kernel call: the probe set for a vector is its own bucket
  * plus the buckets reached by flipping subsets (size ≤ 2) of the
  * `flip` planes where the vector's |cosine margin| is SMALLEST — the
  * planes a true neighbor could actually sit across. Probe volume is
  * 1 + flip + C(flip,2) — CONSTANT in the plane count — so the plane
  * count is free to grow with the corpus (holding bucket occupancy
  * flat) without the probe fan-out growing with it; exhaustive
  * radius-2 probing pays O(numPlanes²) per vector and prunes nothing
  * the margins don't.
  *
  * Why an Expression and not composed columns: the margins array
  * feeding both the bucket and a rank-sort feeding 22 XOR masks is
  * exactly the shape Catalyst's CollapseProject re-inlines — each
  * `element_at(ranked, j)` re-expanded the whole array_sort over nP
  * cosines, each with its own copy of the plane literals (measured:
  * 8.8 MiB task binaries, dedup_embedding_ann 58 s at the 10× replica
  * scale vs 1.1 s for this kernel's plan at sf0.1). Margins, bucket,
  * partial selection, and mask family here are one JIT'd pass. */
case class LshProbeBuckets(child: Expression, planes: Array[Array[Double]], flip: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) =>
      if (flip >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName requires flip >= 1, got $flip")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_probe_buckets"

  @transient private lazy val dim: Int = if (planes.isEmpty) 0 else planes(0).length
  @transient private lazy val flat: Array[Double] = planes.flatten
  @transient private lazy val invNorms: Array[Double] = planes.map { p =>
    var s = 0.0; var i = 0
    while (i < p.length) { s += p(i) * p(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0.0) 0.0 else 1.0 / n
  }

  override def nullSafeEval(a: Any): Any =
    LshKernel.probeBuckets(a.asInstanceOf[ArrayData], flat, invNorms, planes.length, dim, flip)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("lshPlanesFlat", flat, "double[]")
    val nRef = ctx.addReferenceObj("lshInvNorms", invNorms, "double[]")
    defineCodeGen(ctx, ev, x =>
      s"graft.functions.LshKernel.probeBuckets($x, $pRef, $nRef, ${planes.length}, $dim, $flip)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** JVM kernel for [[LshBucket]] / [[LshProbeBuckets]] — standalone
  * object so the mirror class exposes true statics for generated
  * code. Sign convention: bit p set iff dot(v, plane_p) >= 0,
  * identical to the cosine formulation (division by the positive
  * norms cannot change the sign). Margin ranking multiplies |dot| by
  * the plane's inverse norm — the vector's own norm is a common
  * positive factor across planes, so the ranking equals the
  * |cosine| ranking; ties break toward the lower plane index. */
/** Hard IVF cell assignment (argmax centroid cosine, ties → lowest
  * cell index) against a fixed codebook, as ONE kernel loop. Replaces
  * the `array_max` over per-centroid `(cosine, -idx)` struct literals,
  * whose expression tree grew LINEARLY with nlist — at the re-fit
  * codebook sizes the nlist lever needs (√n cells), the struct
  * formulation fell out of whole-stage codegen and assignment cost
  * scaled with the codebook instead of the corpus (measured on the
  * 10× replica set: 2.9 s at nlist=16 → 24.7 s at nlist=141 for the
  * SAME within-cell work). The codebook rides along as a codegen
  * reference object, exactly like [[LshBucket]]'s plane family.
  *
  * Bit-identical to the struct formulation for real inputs: the
  * per-centroid cosine runs the same accumulate order as
  * [[CosineSimilarity]], and strict `>` keeps the first (lowest-index)
  * cell on exact ties, matching `array_max`'s `(ccos, -idx)` order.
  * (Degenerate difference: the struct path orders -0.0 < 0.0 and
  * NaN largest; the kernel treats -0.0 == 0.0 and never selects NaN —
  * unreachable for finite embeddings and a zero-free codebook.) */
case class IvfCell(child: Expression, centroids: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ivf_cell"

  @transient private lazy val dim: Int = if (centroids.isEmpty) 0 else centroids(0).length
  @transient private lazy val flat: Array[Double] = centroids.flatten

  override def nullSafeEval(a: Any): Any =
    IvfKernel.cell(a.asInstanceOf[ArrayData], flat, centroids.length, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCentroidsFlat", flat, "double[]")
    defineCodeGen(ctx, ev, x =>
      s"graft.functions.IvfKernel.cell($x, $cRef, ${centroids.length}, $dim)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object IvfKernel {
  def cell(v: ArrayData, flat: Array[Double], k: Int, dim: Int): Int = {
    val n = math.min(dim, v.numElements())
    // |v|² accumulates in the same element order as CosineSimilarity's
    // interleaved loop — addition order decides the double, so the
    // cosines below match the struct formulation bit-for-bit
    var nx = 0.0
    var i = 0
    while (i < n) { val xi = v.getDouble(i); nx += xi * xi; i += 1 }
    var best = Double.NegativeInfinity
    var bestIdx = 0
    var c = 0
    while (c < k) {
      val off = c * dim
      var dot = 0.0
      var ny = 0.0
      i = 0
      while (i < n) {
        val xi = v.getDouble(i); val yi = flat(off + i)
        dot += xi * yi; ny += yi * yi
        i += 1
      }
      val denom = math.sqrt(nx) * math.sqrt(ny)
      val cos = if (denom == 0.0) 0.0 else dot / denom
      if (cos > best) { best = cos; bestIdx = c }
      c += 1
    }
    bestIdx
  }
}

object LshKernel {
  def bucket(v: ArrayData, planesFlat: Array[Double], nP: Int, dim: Int): Long = {
    val n = math.min(dim, v.numElements())
    var b = 0L
    var p = 0
    while (p < nP) {
      val off = p * dim
      var dot = 0.0
      var i = 0
      while (i < n) { dot += v.getDouble(i) * planesFlat(off + i); i += 1 }
      if (dot >= 0) b |= 1L << p
      p += 1
    }
    b
  }

  def probeBuckets(v: ArrayData, planesFlat: Array[Double], invNorms: Array[Double],
                   nP: Int, dim: Int, flip0: Int): ArrayData = {
    val n = math.min(dim, v.numElements())
    val m = new Array[Double](nP)
    var bucket = 0L
    var p = 0
    while (p < nP) {
      val off = p * dim
      var dot = 0.0
      var i = 0
      while (i < n) { dot += v.getDouble(i) * planesFlat(off + i); i += 1 }
      if (dot >= 0) bucket |= 1L << p
      m(p) = math.abs(dot) * invNorms(p)
      p += 1
    }
    // partial selection of the `flip` lowest-|margin| plane indices
    // (strict < keeps ties on the lower index, matching the
    // (|margin|, index) struct-sort formulation it replaces)
    val flip = math.min(flip0, nP)
    val sel = new Array[Int](flip)
    val used = new Array[Boolean](nP)
    var k = 0
    while (k < flip) {
      var best = -1
      var bm = Double.PositiveInfinity
      var j = 0
      while (j < nP) {
        if (!used(j) && m(j) < bm) { bm = m(j); best = j }
        j += 1
      }
      used(best) = true
      sel(k) = best
      k += 1
    }
    val out = new Array[Long](1 + flip + flip * (flip - 1) / 2)
    out(0) = bucket
    var w = 1
    var a = 0
    while (a < flip) { out(w) = bucket ^ (1L << sel(a)); w += 1; a += 1 }
    a = 0
    while (a < flip) {
      var b2 = a + 1
      while (b2 < flip) {
        out(w) = bucket ^ (1L << sel(a)) ^ (1L << sel(b2))
        w += 1
        b2 += 1
      }
      a += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Product-quantization ENCODE: the m-byte PQ code of an
  * array<double> vector against the frozen per-subspace codebooks
  * (Jégou et al. 2011). Each contiguous dsub-dim subvector maps to
  * its nearest (L2) subspace centroid; ties keep the lowest centroid
  * id. The codebooks ride along as one flat codegen reference object
  * ([[LshBucket]]'s pattern), so the expression tree is
  * codebook-size-independent and the encode scan stays inside
  * whole-stage codegen — at 100 TB this is the index build's map-only
  * hot loop (O(m·k·dsub) = O(k·dim) arithmetic per row, emitting m
  * bytes per vector: a 64× storage cut over float64). */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "pq_encode"

  @transient private lazy val m: Int = codebooks.length
  @transient private lazy val k: Int = codebooks(0).length
  @transient private lazy val dsub: Int = codebooks(0)(0).length
  @transient private lazy val flat: Array[Double] = codebooks.flatten.flatten

  override def nullSafeEval(a: Any): Any =
    PqKernel.encode(a.asInstanceOf[ArrayData], flat, m, k, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("pqCodebooksFlat", flat, "double[]")
    defineCodeGen(ctx, ev, x =>
      s"graft.functions.PqKernel.encode($x, $cRef, $m, $k, $dsub)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Asymmetric cosine of a full-precision query against PQ codes: the
  * corpus vector is reconstructed implicitly as the concatenation of
  * its m subspace centroids — dot(q, x̂) = Σ_s dot(q_s, cb_s[code_s])
  * and |x̂|² = Σ_s |cb_s[code_s]|² (subspaces are orthogonal
  * coordinate blocks, so cross terms vanish). The centroid norms are
  * PRECOMPUTED once per plan as a reference object, so scoring reads
  * only the m code bytes per candidate — the PQ serving scan touches
  * 8 bytes/vector where SQ8 reads 64 and float64 reads 512. Same ADC
  * idea as [[CosineInt8]], product-quantizer variant. */
case class CosinePq(left: Expression, right: Expression,
                    codebooks: Array[Array[Array[Double]]])
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ByteType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<tinyint>), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_pq"

  @transient private lazy val m: Int = codebooks.length
  @transient private lazy val k: Int = codebooks(0).length
  @transient private lazy val dsub: Int = codebooks(0)(0).length
  @transient private lazy val flat: Array[Double] = codebooks.flatten.flatten
  @transient private lazy val norms2: Array[Double] = codebooks.flatMap(_.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    s
  })

  override def nullSafeEval(a: Any, b: Any): Any =
    PqKernel.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      flat, norms2, m, k, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("pqCodebooksFlat", flat, "double[]")
    val nRef = ctx.addReferenceObj("pqNorms2", norms2, "double[]")
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.PqKernel.cosine($x, $y, $cRef, $nRef, $m, $k, $dsub);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dense matrix-vector product against a FIXED row-major matrix — the
  * random-projection (Johnson–Lindenstrauss) kernel behind
  * `emb_project`: y_p = Σ_i M[p][i]·x_i, one fused loop, matrix as a
  * codegen reference object ([[LshBucket]]'s pattern). Accumulation
  * runs in ascending i per output row, so an oracle summing the same
  * inlined weights in subscript order reproduces the doubles. */
case class MatVec(child: Expression, matrix: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "mat_vec"

  @transient private lazy val rows: Int = matrix.length
  @transient private lazy val dim: Int = if (matrix.isEmpty) 0 else matrix(0).length
  @transient private lazy val flat: Array[Double] = matrix.flatten

  override def nullSafeEval(a: Any): Any =
    MatVecKernel.apply(a.asInstanceOf[ArrayData], flat, rows, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("matVecFlat", flat, "double[]")
    defineCodeGen(ctx, ev, x =>
      s"graft.functions.MatVecKernel.apply($x, $mRef, $rows, $dim)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MatVecKernel {
  def apply(v: ArrayData, flat: Array[Double], rows: Int, dim: Int): ArrayData = {
    val n = math.min(dim, v.numElements())
    val out = new Array[Double](rows)
    var p = 0
    while (p < rows) {
      val off = p * dim
      var s = 0.0
      var i = 0
      while (i < n) { s += flat(off + i) * v.getDouble(i); i += 1 }
      out(p) = s
      p += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** JVM kernel for [[PqEncode]] / [[CosinePq]] — standalone object so
  * generated code sees true statics. Flat layout:
  * flat[(s·k + c)·dsub + i] = codebooks(s)(c)(i). */
object PqKernel {
  def encode(v: ArrayData, flat: Array[Double], m: Int, k: Int, dsub: Int): ArrayData = {
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      val base = s * dsub
      var best = Double.PositiveInfinity
      var bestIdx = 0
      var c = 0
      while (c < k) {
        val off = (s * k + c) * dsub
        var d2 = 0.0
        var i = 0
        while (i < dsub) {
          val d = v.getDouble(base + i) - flat(off + i)
          d2 += d * d
          i += 1
        }
        if (d2 < best) { best = d2; bestIdx = c }
        c += 1
      }
      out(s) = bestIdx.toByte
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  def cosine(q: ArrayData, codes: ArrayData, flat: Array[Double], norms2: Array[Double],
             m: Int, k: Int, dsub: Int): Double = {
    var dot = 0.0
    var nq = 0.0
    var nx2 = 0.0
    var s = 0
    while (s < m) {
      val c = codes.getByte(s) & 0xff
      val off = (s * k + c) * dsub
      val base = s * dsub
      var i = 0
      while (i < dsub) {
        val qi = q.getDouble(base + i)
        dot += qi * flat(off + i)
        nq += qi * qi
        i += 1
      }
      nx2 += norms2(s * k + c)
      s += 1
    }
    val denom = math.sqrt(nq) * math.sqrt(nx2)
    if (denom == 0.0) 0.0 else dot / denom
  }
}

/** Highest adjacent-pair (bigram) multiplicity of a token array in
  * ONE map-side pass — the `max(count) OVER (doc, bigram)` that
  * `text_repetition` / `pipe_gopher_gate` need, WITHOUT the
  * per-(doc_id, bigram) shuffle: the statistic is a pure function of
  * one document, so exploding bigrams into a corpus-wide groupBy
  * shuffles the whole corpus to compute something each scan task
  * already holds. The kernel sorts the doc's bigram index space by
  * (token[i], token[i+1]) and returns the longest equal run — EXACT
  * (string comparison, no hash-collision caveat), O(b log b) in the
  * document's own bigram count, and inside whole-stage codegen.
  * Empty/one-token docs return 0; null elements compare as empty. */
case class TopBigramCount(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "top_bigram_count"

  override def nullSafeEval(a: Any): Any =
    TopBigramCountKernel.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.TopBigramCountKernel.compute($x)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** JVM kernel for [[TopBigramCount]] — standalone object so the
  * mirror class exposes a true static for generated code. */
object TopBigramCountKernel {
  import org.apache.spark.unsafe.types.UTF8String

  def compute(a: ArrayData): Long = {
    val n = a.numElements()
    if (n < 2) return 0L
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      val t = a.getUTF8String(i)
      toks(i) = if (t == null) UTF8String.EMPTY_UTF8 else t
      i += 1
    }
    // sort bigram START indices by the pair (toks[i], toks[i+1]) —
    // any total order groups equal pairs adjacently, which is all the
    // run scan observes; indices avoid materializing bigram strings
    val idx = new Array[Integer](n - 1)
    i = 0
    while (i < n - 1) { idx(i) = Integer.valueOf(i); i += 1 }
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      override def compare(p: Integer, q: Integer): Int = {
        val c = toks(p).compareTo(toks(q))
        if (c != 0) c else toks(p + 1).compareTo(toks(q + 1))
      }
    })
    var best = 1L
    var run = 1L
    i = 1
    while (i < n - 1) {
      val p = idx(i - 1); val q = idx(i)
      if (toks(p).equals(toks(q)) && toks(p + 1).equals(toks(q + 1))) {
        run += 1
        if (run > best) best = run
      } else run = 1L
      i += 1
    }
    best
  }
}

/** Token Shannon entropy of a document in ONE map-side pass — the
  * unigram-distribution form of the repetitiveness signal
  * (`-Σ (c/n)·log2(c/n)` over the doc's token counts): a local sort
  * groups equal tokens into runs, run lengths are the counts, and
  * the entropy accumulates in the same scan — no per-(doc, token)
  * shuffle, no map-typed HOF state. Empty arrays yield 0.0; null
  * elements compare as empty strings. Exact token comparison (the
  * [[TopBigramCount]] contract). */
case class TokenEntropy(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "token_entropy"

  override def nullSafeEval(a: Any): Any =
    TokenEntropyKernel.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.TokenEntropyKernel.compute($x)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** JVM kernel for [[TokenEntropy]]. */
object TokenEntropyKernel {
  import org.apache.spark.unsafe.types.UTF8String

  private val LOG2 = math.log(2.0)

  def compute(a: ArrayData): Double = {
    val n = a.numElements()
    if (n == 0) return 0.0
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      val t = a.getUTF8String(i)
      toks(i) = if (t == null) UTF8String.EMPTY_UTF8 else t
      i += 1
    }
    java.util.Arrays.sort(toks.asInstanceOf[Array[AnyRef]])
    // runs of equal adjacent tokens are the unigram counts
    var h = 0.0
    var run = 1L
    i = 1
    while (i <= n) {
      if (i < n && toks(i).equals(toks(i - 1))) run += 1
      else {
        val p = run.toDouble / n
        h -= p * math.log(p) / LOG2
        run = 1L
      }
      i += 1
    }
    h
  }
}

object VectorFunctions {
  /** Column API: cosine_similarity(a, b) for array<double> columns. */
  def cosine_similarity(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      CosineSimilarity(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column API: asymmetric cosine of a float query against int8 codes. */
  def cosine_int8(q: Column, codes: Column): Column =
    GraftColumnBridge.column(
      CosineInt8(GraftColumnBridge.expression(q), GraftColumnBridge.expression(codes)))

  /** Column API: common-element count of two sorted array<long> columns. */
  def sorted_intersect_count(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      SortedIntersectCount(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column API: all n-gram rolling hashes of a string column. */
  def ngram_hashes(c: Column, n: Int): Column =
    GraftColumnBridge.column(
      NgramHashes(GraftColumnBridge.expression(c),
        org.apache.spark.sql.catalyst.expressions.Literal(n)))

  /** Column API: all code-point-window n-gram rolling hashes of a
    * string column (multi-byte safe; ASCII-identical to
    * [[ngram_hashes]]). */
  def ngram_hashes_chars(c: Column, n: Int): Column =
    GraftColumnBridge.column(
      NgramHashesChars(GraftColumnBridge.expression(c),
        org.apache.spark.sql.catalyst.expressions.Literal(n)))

  /** Column API: frozen-weight quality-classifier logit of a gram
    * array ([[QualityScore]]). */
  def quality_score(c: Column): Column =
    GraftColumnBridge.column(QualityScore(GraftColumnBridge.expression(c)))

  /** Column API: all n-gram md5-60 hashes of a string column. */
  def md5_ngram_hashes(c: Column, n: Int): Column =
    GraftColumnBridge.column(
      Md5NgramHashes(GraftColumnBridge.expression(c),
        org.apache.spark.sql.catalyst.expressions.Literal(n)))

  /** Column API: distinct sliding-window minima of a hash array. */
  def winnow_minima(c: Column, w: Int): Column =
    GraftColumnBridge.column(
      WinnowMinima(GraftColumnBridge.expression(c),
        org.apache.spark.sql.catalyst.expressions.Literal(w)))

  /** Column API: 64-bit SimHash of a token array. */
  def simhash64(c: Column): Column =
    GraftColumnBridge.column(Simhash64(GraftColumnBridge.expression(c)))

  /** Column API: highest adjacent-pair multiplicity of a token array. */
  def top_bigram_count(c: Column): Column =
    GraftColumnBridge.column(TopBigramCount(GraftColumnBridge.expression(c)))

  /** Column API: token Shannon entropy (bits) of a token array. */
  def token_entropy(c: Column): Column =
    GraftColumnBridge.column(TokenEntropy(GraftColumnBridge.expression(c)))

  /** Column API: BPE token ids against the frozen [[BpeVocab]]. */
  def bpe_token_ids(c: Column): Column =
    GraftColumnBridge.column(BpeTokenIds(GraftColumnBridge.expression(c)))

  /** Column API: sign-LSH home bucket against a fixed plane family. */
  def lsh_bucket(v: Column, planes: Array[Array[Double]]): Column =
    GraftColumnBridge.column(LshBucket(GraftColumnBridge.expression(v), planes))

  /** Column API: margin-guided multi-probe bucket set (home bucket
    * first) against a fixed plane family. */
  def lsh_probe_buckets(v: Column, planes: Array[Array[Double]], flip: Int): Column =
    GraftColumnBridge.column(LshProbeBuckets(GraftColumnBridge.expression(v), planes, flip))

  /** Column API: hard IVF cell assignment against a fixed codebook. */
  def ivf_cell(v: Column, centroids: Array[Array[Double]]): Column =
    GraftColumnBridge.column(IvfCell(GraftColumnBridge.expression(v), centroids))

  /** Column API: mat-vec against a fixed row-major matrix. */
  def mat_vec(v: Column, matrix: Array[Array[Double]]): Column =
    GraftColumnBridge.column(MatVec(GraftColumnBridge.expression(v), matrix))

  /** Column API: m-byte PQ code against the frozen subspace codebooks. */
  def pq_encode(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftColumnBridge.column(PqEncode(GraftColumnBridge.expression(v), codebooks))

  /** Column API: asymmetric cosine of a float query against PQ codes. */
  def cosine_pq(q: Column, codes: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftColumnBridge.column(
      CosinePq(GraftColumnBridge.expression(q), GraftColumnBridge.expression(codes), codebooks))

  /** Column API: full minhash signature of a shingle-hash array. */
  def minhash_signature(c: Column, numPerms: Int): Column =
    GraftColumnBridge.column(
      MinhashSignature(GraftColumnBridge.expression(c),
        org.apache.spark.sql.catalyst.expressions.Literal(numPerms)))

  /** Registers graft's native functions for SQL use on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_signature", exprs => MinhashSignature(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => Simhash64(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count", exprs => SortedIntersectCount(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ngram_hashes", exprs => NgramHashes(exprs(0), exprs(1)), "built-in")
  }
}
