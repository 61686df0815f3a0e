package graft

import graft.functions.{CosineSimilarity, MinhashSignature, NgramHashes, Simhash64, SortedIntersectCount}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: enable graft's native
  * expressions on any session (including spark-sql / thrift users)
  * with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * This is the standard library-integration path — no code changes in
  * the consuming application, and the functions resolve in plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.BinnedRangeJoinRule)
    ext.injectFunction((
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (children: Seq[Expression]) => SortedIntersectCount(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("ngram_hashes"),
      new ExpressionInfo(classOf[NgramHashes].getName, "ngram_hashes"),
      (children: Seq[Expression]) => NgramHashes(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinhashSignature].getName, "minhash_signature"),
      (children: Seq[Expression]) => MinhashSignature(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[Simhash64].getName, "simhash64"),
      (children: Seq[Expression]) => Simhash64(children(0))))
  }
}
