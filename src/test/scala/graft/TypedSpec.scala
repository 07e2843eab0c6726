package graft

import graft.core.{Graph, Typed}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The typed Dataset façade: case-class rows decode correctly AND
  * Column-based predicates on the typed view still reach the parquet scan
  * (the reason the façade forbids typed lambda filters). */
class TypedSpec extends AnyFunSuite {
  import TestSpark._

  test("Dataset[Person] round-trips the nodes table with case-class rows") {
    val ds = Typed.persons(spark, sf)
    assert(ds.count() == Graph.nodes(spark, sf).count())
    val p = ds.orderBy("nid").head()
    assert(p.nid == 0 && p.name.startsWith("Customer#") && p.house.nonEmpty)
  }

  test("column predicate on the typed view pushes to the parquet scan") {
    val ds = Typed.persons(spark, sf).filter(col("name") === "Customer#000000042")
    val scanPlan = ds.queryExecution.sparkPlan.toString
    assert(scanPlan.contains("PushedFilters") && scanPlan.contains("c_name"),
      s"no pushed filter in:\n$scanPlan")
    assert(ds.head().nid == 42)
  }

  test("Dataset[EdgeRow] decodes every edge type") {
    import TestSpark.spark.implicits._
    val types = Typed.personEdges(spark, sf)
      .groupByKey(_.relType).count().collect().map(_._1).toSet
    assert(types == Set("FRIEND_OF", "SAME_FAMILY", "ENEMY_OF", "ROMANTIC_WITH"))
  }
}
