package graft.etl

import graft.core.Graph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's ingestion / graph-construction pipeline
  * (`get_insert.py:165-176`), set-oriented: one batch job instead of ~400
  * bolt round-trips (SURVEY §3.3).
  *
  *  - S2 `http_source_hp_api` → `spark.read.json` over a snapshotted fixture
  *    with an explicit schema (no live HTTP in the engine).
  *  - S4 `create_constraints` → deterministic dedup (min-id wins) + test
  *    assertion `count == countDistinct(name)`.
  *  - S5/S6 upserts → union + anti-join (MERGE INTO at warehouse scale).
  *  - S3 `truncate_graph` → `write.mode("overwrite")` of the canonical
  *    tables.
  */
object GraphBuilder {

  val FixturePath = "/root/repo/src/main/resources/hp_characters.json"

  /** Explicit schema (FIXTURES.md §A1) — never infer on a production read:
    * schema inference is a second full pass over 100 TB. */
  val characterSchema: StructType = StructType(Seq(
    StructField("id", StringType), StructField("name", StringType),
    StructField("house", StringType), StructField("species", StringType),
    StructField("gender", StringType), StructField("ancestry", StringType),
    StructField("wizard", BooleanType), StructField("hogwartsStudent", BooleanType),
    StructField("hogwartsStaff", BooleanType), StructField("alive", BooleanType),
    StructField("image", StringType)))

  /** S2 — batch JSON source over the API snapshot. */
  def readCharacters(spark: SparkSession, path: String = FixturePath): DataFrame =
    spark.read.schema(characterSchema).option("multiLine", "true").json(path)

  /** Cleaning rules of `get_insert.py:74-103`: drop null names, default
    * house to "Unknown", alive to true, image to ''; S4 uniqueness via
    * deterministic min-id dedup (Cypher MERGE keeps the first writer; we
    * keep the lowest id so the winner is order-independent). */
  def cleanCharacters(raw: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("name")).orderBy(col("id"))
    raw.filter(col("name").isNotNull && col("name") =!= "")
      .withColumn("house",
        when(col("house").isNull || col("house") === "", lit("Unknown")).otherwise(col("house")))
      .withColumn("alive", coalesce(col("alive"), lit(true)))
      .withColumn("image", coalesce(col("image"), lit("")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** S3 + canonical-table writer: overwrite-mode parquet of the projected
    * graph. At 100 TB: partition edges by relType, bucket by src, so
    * per-type expansions prune and same-src joins avoid a shuffle. */
  def writeCanonical(spark: SparkSession, sfDir: String, outDir: String): Unit = {
    Graph.nodes(spark, sfDir)
      .write.mode("overwrite").parquet(s"$outDir/nodes")
    Graph.personEdges(spark, sfDir).unionByName(Graph.belongsTo(spark, sfDir))
      .repartition(col("relType"))
      .write.mode("overwrite").partitionBy("relType").parquet(s"$outDir/edges")
  }
}
