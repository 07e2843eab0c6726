package graft.core

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed `Dataset[T]` façade over the graph projection — the case-class
  * Encoder mapping of SURVEY §1.3 (`Person` nodes as `Dataset[Person]`).
  * Library consumers get compile-checked row shapes; predicates and
  * projections stay Column-based so Catalyst still sees them (a typed
  * lambda `.filter(p => …)` would be opaque — no pushdown, no pruning —
  * which is why the ops layer composes on DataFrames and this façade is
  * the boundary type, not the execution currency).
  */
object Typed {

  /** SURVEY §1.2 Person schema, projected from the relational corpus. */
  final case class Person(nid: Long, name: String, house: String,
                          nation: Long, acctbal: Double)

  /** One typed edge row (src/dst are Person.name foreign keys). */
  final case class EdgeRow(src: String, dst: String, relType: String)

  def persons(spark: SparkSession, sfDir: String): Dataset[Person] = {
    import spark.implicits._
    Graph.nodes(spark, sfDir).as[Person]
  }

  def personEdges(spark: SparkSession, sfDir: String): Dataset[EdgeRow] = {
    import spark.implicits._
    Graph.personEdges(spark, sfDir).as[EdgeRow]
  }
}
