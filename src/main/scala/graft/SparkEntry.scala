package graft

import graft.ops.GraphOps
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is one entry in `queries`
  * (runnable at any sfDir) and, when SQL-expressible, one entry in
  * `oracleSql` (ANSI SQL the driver runs in DuckDB over the same parquet).
  * Column names are aliased identically on both sides; all outputs carry a
  * total order so row sets (and order) are deterministic.
  */
object SparkEntry {

  /** Flagship: the reference's Winder common-neighbors top-k (app.py:206-245)
    * over the graph projection. Driver smoke-checks rows > 0 at sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    GraphOps.winderTopK(spark, "/root/testdata/sf0.001", WinderFriends)

  /** Fixed parameters baked into the registry (exist at every sf). */
  val WinderFriends: Seq[Int] = Seq(1, 5, 9)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j1_winder_topk" -> ((s, d) => GraphOps.winderTopK(s, d, WinderFriends)),
    "s1_scan_persons" -> ((s, d) => GraphOps.scanPersons(s, d)),
    "p3_search_ci" -> ((s, d) => GraphOps.searchCi(s, d, "#00000014")),
  )

  def oracleSql: Map[String, String] = Map(
    "j1_winder_topk" ->
      s"""WITH ${Oracle.nodesCte}, ${Oracle.friendsCte}, ${Oracle.friendsUndirCte},
         |fr AS (SELECT name AS f_name FROM n WHERE nid IN (${WinderFriends.mkString(", ")})),
         |cand AS (
         |  SELECT fr.f_name, fu.dst AS candidate FROM fr JOIN fu ON fr.f_name = fu.src
         |  WHERE fu.dst NOT IN (SELECT f_name FROM fr))
         |SELECT candidate, count(*) AS common_friends,
         |       array_to_string(list_sort(list(f_name)), ',') AS shared_with
         |FROM cand GROUP BY candidate
         |ORDER BY common_friends DESC, candidate LIMIT 3""".stripMargin,
    "s1_scan_persons" ->
      s"""WITH ${Oracle.nodesCte}
         |SELECT name, house, nation, acctbal FROM n ORDER BY name""".stripMargin,
    "p3_search_ci" ->
      s"""WITH ${Oracle.nodesCte}
         |SELECT name, house FROM n
         |WHERE contains(lower(name), '#00000014') ORDER BY name LIMIT 10""".stripMargin,
  )
}
