package graft

import graft.ml.{DecisionTree, FeatureSpec, FeatureVectorizer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Port of the reference's DecisionTreeRegressionTest +
  * DecisionTreeConfigTest (flight-delay data): the engine must
  * reproduce the trainer/predictor semantics, including the exact
  * validation error messages. */
class DecisionTreeSpec extends SparkSpec {

  private val csvSchema = StructType(Seq(
    StructField("dofM", IntegerType), StructField("dofW", IntegerType),
    StructField("carrier", DoubleType), StructField("tailNum", StringType),
    StructField("flightNum", IntegerType), StructField("originId", IntegerType),
    StructField("origin", StringType), StructField("destId", IntegerType),
    StructField("dest", StringType), StructField("scheduleDepTime", DoubleType),
    StructField("deptime", DoubleType), StructField("depDelayMins", DoubleType),
    StructField("scheduledArrTime", DoubleType), StructField("arrTime", DoubleType),
    StructField("arrDelay", DoubleType), StructField("elapsedTime", DoubleType),
    StructField("distance", IntegerType)))

  /** Training frame mirroring the reference test's getInputData:
    * dofM/dofW shifted to 0-based, delayed = depDelayMins > 40. */
  private lazy val flights: DataFrame =
    spark.read.schema(csvSchema)
      .csv("/root/reference/src/test/resources/trainData.csv")
      .withColumn("dofM", col("dofM") - 1)
      .withColumn("dofW", col("dofW") - 1)
      .withColumn("delayed", when(col("depDelayMins") > 40, 1.0).otherwise(0.0))

  private val featureList =
    Seq("dofM", "dofW", "carrier", "originId", "destId", "scheduleDepTime",
      "scheduledArrTime", "elapsedTime")

  private val trainSpec = FeatureSpec(
    include = Some(featureList), labelField = "delayed",
    cardinality = FeatureSpec.parseCardinality("dofW:7"))

  test("flight-delay train + predict reproduces the reference's labels") {
    val modelPath = java.nio.file.Files.createTempDirectory("graft-dt-flight").toString
    DecisionTree.train(flights, trainSpec, modelPath, maxDepth = 9, maxBins = 100)
    val model = DecisionTree.load(spark, modelPath)

    // the 6 held-out flights from DecisionTreeRegressionTest.java:192-203
    import spark.implicits._
    val toScore = Seq(
      (3, 5, 1.0, 12478, 12892, 900.0, 1225.0, 385.0),
      (24, 5, 2.0, 10397, 12953, 1150.0, 1359.0, 129.0),
      (3, 5, 3.0, 13930, 13198, 2030.0, 2205.0, 95.0),
      (28, 2, 1.0, 12892, 11298, 1025.0, 1530.0, 185.0),
      (1, 3, 4.0, 13930, 11433, 1641.0, 1905.0, 84.0),
      (1, 3, 4.0, 10397, 15376, 1855.0, 2108.0, 253.0))
      .toDF("dofM", "dofW", "carrier", "originId", "destId",
        "scheduleDepTime", "scheduledArrTime", "elapsedTime")
    val predicted = DecisionTree.predict(toScore, model,
      trainSpec.copy(labelField = "unused"), "delayed")
      .select("carrier", "originId", "delayed").collect()
      .map(r => (r.getDouble(0), r.getInt(1)) -> r.getDouble(2)).toMap

    // expected labels from DecisionTreeRegressionTest.java:221-233
    val expected = Map(
      (1.0, 12478) -> 1.0, (2.0, 10397) -> 0.0, (3.0, 13930) -> 1.0,
      (1.0, 12892) -> 0.0, (4.0, 13930) -> 1.0, (4.0, 10397) -> 1.0)
    expected.foreach { case (k, v) =>
      assert(predicted(k) == v, s"flight $k: predicted ${predicted(k)}, expected $v")
    }
  }

  test("rows with null label are dropped before training") {
    val withNulls = flights.withColumn("delayed",
      when(col("flightNum") % 7 === 0, lit(null).cast("double")).otherwise(col("delayed")))
    val modelPath = java.nio.file.Files.createTempDirectory("graft-dt-null").toString
    // must not throw despite null labels
    DecisionTree.train(withNulls, trainSpec, modelPath, maxDepth = 3)
  }

  test("null feature values become absent sparse-vector slots, not zeros") {
    import spark.implicits._
    val df = Seq((Some(1.0), 2.0), (None, 3.0)).toDF("a", "b")
    val out = FeatureVectorizer.assemble(df,
      FeatureSpec(include = Some(Seq("a", "b")), labelField = "unused"))
      .select(FeatureVectorizer.FeaturesCol).collect()
    val full = out(0).getAs[org.apache.spark.ml.linalg.Vector](0)
    val sparse = out(1).getAs[org.apache.spark.ml.linalg.Vector](0)
    assert(full.numActives == 2)
    assert(sparse.numActives == 1 && sparse.size == 2)
  }

  test("validation error messages mirror the reference") {
    val schema = flights.schema
    val e1 = intercept[IllegalArgumentException] {
      FeatureSpec(include = Some(featureList), labelField = "dealyed").validateLabel(schema)
    }
    assert(e1.getMessage == "Label field dealyed does not exists in the input schema.")

    val e2 = intercept[IllegalArgumentException] {
      FeatureSpec(include = Some(featureList :+ "destinationId"), labelField = "delayed")
        .featureColumns(schema)
    }
    assert(e2.getMessage == "Field destinationId does not exists in the input schema.")

    val e3 = intercept[IllegalArgumentException] {
      FeatureSpec(labelField = "delayed").featureColumns(schema)
    }
    assert(e3.getMessage ==
      "Features must be of type : int, double, float, long but was of type STRING for field tailNum.")

    val e4 = intercept[IllegalArgumentException] {
      FeatureSpec(include = Some(featureList), labelField = "tailNum").validateLabel(schema)
    }
    assert(e4.getMessage == "Label field must be of type Double, but was STRING.")

    intercept[IllegalArgumentException] {
      FeatureSpec(include = Some(Seq("dofM")), exclude = Some(Seq("dofW")), labelField = "delayed")
        .featureColumns(schema)
    }
  }

  test("invalid cardinality mapping fails the training run") {
    val badSpec = trainSpec.copy(cardinality = Map("dofW" -> 2))
    val modelPath = java.nio.file.Files.createTempDirectory("graft-dt-bad").toString
    intercept[Exception] {
      DecisionTree.train(flights, badSpec, modelPath, maxDepth = 9)
    }
  }

  test("hyphenated field names sanitize to underscores") {
    assert(FeatureSpec.sanitize("days-of-week") == "days_of_week")
  }

  test("sanitization rejects a frame where the underscore name already exists") {
    import org.apache.spark.sql.functions.lit
    val clashing = flights
      .withColumnRenamed("dofW", "day-of-week")
      .withColumn("day_of_week", lit(0.0))
    val spec = FeatureSpec(include = Some(Seq("day-of-week")), labelField = "delayed")
    val e = intercept[IllegalArgumentException] {
      graft.ml.FeatureVectorizer.assemble(clashing, spec)
    }
    assert(e.getMessage.contains("day-of-week") && e.getMessage.contains("day_of_week"))
  }

  test("hyphenated feature and label columns train and predict end-to-end") {
    // the reference README's documented limitation, wired through:
    // rename-before-MLlib must happen inside the pipeline, so a user
    // frame with hyphenated names just works.
    val hyphenated = flights
      .withColumnRenamed("dofW", "day-of-week")
      .withColumnRenamed("delayed", "is-delayed")
    val spec = FeatureSpec(
      include = Some(featureList.map(c => if (c == "dofW") "day-of-week" else c)),
      labelField = "is-delayed",
      cardinality = FeatureSpec.parseCardinality("day-of-week:7"))
    val modelPath = java.nio.file.Files.createTempDirectory("graft-dt-hyphen").toString
    DecisionTree.train(hyphenated, spec, modelPath, maxDepth = 3)
    val model = DecisionTree.load(spark, modelPath)
    val scored = DecisionTree.predict(
      hyphenated.drop("is-delayed"), model, spec.copy(labelField = "unused"), "pred")
    assert(scored.filter(col("pred").isNotNull).count() == flights.count())
    // the scored frame keeps the (sanitized) feature column
    assert(scored.columns.contains("day_of_week"))
  }
}
