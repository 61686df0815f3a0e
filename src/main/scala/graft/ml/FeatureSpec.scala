package graft.ml

import org.apache.spark.sql.types._

/** Feature-selection + validation semantics of the reference plugin
  * pair (see /root/reference/src/main/java/co/cask/hydrator/plugin/
  * SparkMLTrainer.java:56-93 and SparkMLPredictor.java:57-91):
  *
  *  - `include` XOR `exclude` select the feature columns; both empty →
  *    every column except the label/prediction field;
  *  - features must be int / long / float / double (nullable ok);
  *  - the label must be double (trainer only);
  *  - hyphens in field names are rewritten to underscores (README
  *    "Limitations" — /root/reference/README.md:44);
  *  - `cardinality` ("dofW:7") marks features categorical with N
  *    categories (DecisionTreeTrainer.java:67-71).
  *
  * Error messages mirror the reference's, as asserted by its
  * DecisionTreeConfigTest.java.
  */
final case class FeatureSpec(
    include: Option[Seq[String]] = None,
    exclude: Option[Seq[String]] = None,
    labelField: String,
    cardinality: Map[String, Int] = Map.empty) {

  def sanitizedLabel: String = FeatureSpec.sanitize(labelField)

  /** The spec with every field reference hyphen-sanitized — the form
    * that matches a frame whose columns have been renamed for MLlib
    * (reference README "Limitations": hyphens → underscores before
    * anything reaches the learner). */
  def sanitized: FeatureSpec = FeatureSpec(
    include.map(_.map(FeatureSpec.sanitize)),
    exclude.map(_.map(FeatureSpec.sanitize)),
    FeatureSpec.sanitize(labelField),
    cardinality.map { case (k, v) => FeatureSpec.sanitize(k) -> v })

  /** Ordered feature columns for `schema`, mirroring the reference's
    * getFeatureList: schema order, label excluded. Throws
    * IllegalArgumentException with reference-equivalent messages. */
  def featureColumns(schema: StructType): Seq[String] = {
    require(include.isEmpty || exclude.isEmpty,
      "Cannot specify both featureFieldsToInclude and featureFieldsToExclude.")
    val names = schema.fields.map(_.name)
    val nameSet = names.toSet
    include.getOrElse(Nil).foreach { f =>
      if (!nameSet.contains(f))
        throw new IllegalArgumentException(s"Field $f does not exists in the input schema.")
    }
    exclude.getOrElse(Nil).foreach { f =>
      if (!nameSet.contains(f))
        throw new IllegalArgumentException(s"Field $f does not exists in the input schema.")
    }
    val selected = include match {
      case Some(inc) => names.filter(inc.contains(_))
      case None =>
        val ex = exclude.getOrElse(Nil).toSet
        names.filter(n => !ex.contains(n) && n != labelField)
    }
    selected.foreach { f =>
      schema(f).dataType match {
        case IntegerType | LongType | FloatType | DoubleType => ()
        case other => throw new IllegalArgumentException(
          s"Features must be of type : int, double, float, long but was of type " +
            s"${FeatureSpec.typeName(other)} for field $f.")
      }
    }
    selected.toSeq
  }

  /** Trainer-side label validation (reference's
    * validateLabelFieldForTrainer). */
  def validateLabel(schema: StructType): Unit = {
    if (!schema.fields.exists(_.name == labelField))
      throw new IllegalArgumentException(
        s"Label field $labelField does not exists in the input schema.")
    schema(labelField).dataType match {
      case DoubleType => ()
      case other => throw new IllegalArgumentException(
        s"Label field must be of type Double, but was ${FeatureSpec.typeName(other)}.")
    }
  }
}

object FeatureSpec {
  /** Hyphen → underscore, per the reference README's limitation note. */
  def sanitize(name: String): String = name.replace('-', '_')

  private[ml] def typeName(dt: DataType): String = dt match {
    case StringType => "STRING"
    case BooleanType => "BOOLEAN"
    case TimestampType => "TIMESTAMP"
    case other => other.simpleString.toUpperCase
  }

  /** Parse the reference's "f1:7,f2:3" cardinality mapping string. */
  def parseCardinality(mapping: String): Map[String, Int] =
    mapping.split(",").iterator.filter(_.nonEmpty).map { kv =>
      val Array(k, v) = kv.split(":")
      k.trim -> v.trim.toInt
    }.toMap
}
