package graft

import graft.etl.GraphBuilder
import graft.ops.GraphOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EtlSpec extends AnyFunSuite {
  import TestSpark._

  test("S2/S4 ingest: null names dropped, dup names deduped min-id-first, defaults applied") {
    val clean = GraphBuilder.cleanCharacters(GraphBuilder.readCharacters(spark))
    val rows = clean.collect()
    assert(rows.length == 18) // 20 raw - 1 null name - 1 dup Harry
    assert(clean.count() == clean.select("name").distinct().count()) // S4 constraint
    val harry = rows.find(_.getAs[String]("name") == "Harry Potter").get
    assert(harry.getAs[String]("image") == "http://img/harry.jpg") // c1 beats c17
    val dobby = rows.find(_.getAs[String]("name") == "Dobby").get
    assert(dobby.getAs[String]("house") == "Unknown")
    val griphook = rows.find(_.getAs[String]("name") == "Griphook").get
    assert(griphook.getAs[String]("house") == "Unknown") // empty string → Unknown
    val hagrid = rows.find(_.getAs[String]("name") == "Rubeus Hagrid").get
    assert(hagrid.getAs[Boolean]("alive")) // null alive → true (get_insert.py:100)
  }

  test("S5 upsert is idempotent: merging the same batch twice equals once") {
    val once = GraphOps.upsertPersons(spark, sf).collect().toSeq
    val twice = GraphOps.upsertPersons(spark, sf).collect().toSeq
    assert(once == twice)
    assert(once.exists(r => r.getString(0) == "User#000000001" && r.getString(1) == "BUILDING"))
  }

  test("J11 edge MERGE dedups the duplicate in the batch") {
    val out = GraphOps.upsertEdges(spark, sf).collect()
    assert(out.length == 3) // 4 inserts incl. 1 dup → 3 edges
  }

  test("S3 writeCanonical: overwrite produces partitioned edges readable back") {
    val out = java.nio.file.Files.createTempDirectory("graft_canon").toString
    GraphBuilder.writeCanonical(spark, sf, out)
    GraphBuilder.writeCanonical(spark, sf, out) // S3: overwrite, not append
    val edges = spark.read.parquet(s"$out/edges")
    val expected = graft.core.Graph.allEdges(spark, sf).count()
    assert(edges.count() == expected)
    assert(edges.filter(col("relType") === "BELONGS_TO").count() ==
      graft.core.Graph.nodes(spark, sf).count())
  }
}
