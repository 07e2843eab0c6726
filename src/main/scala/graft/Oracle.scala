package graft

import graft.core.Graph

/** Shared DuckDB-SQL CTE snippets for `SparkEntry.oracleSql` — the oracle
  * expresses the SAME graph projection as `graft.core.Graph`, so the two
  * stay consistent by construction (single source for constants).
  */
object Oracle {
  /** Person nodes CTE. */
  val nodesCte: String =
    "n AS (SELECT c_custkey AS nid, c_name AS name, c_mktsegment AS house, " +
      "c_nationkey AS nation, c_acctbal AS acctbal FROM customer)"

  /** FRIEND_OF canonical-direction edges (J7 same-house self-join). */
  val friendsCte: String =
    "f0 AS (SELECT a.name AS src, b.name AS dst FROM n a JOIN n b " +
      "ON a.house = b.house AND a.nid < b.nid)"

  /** Undirected FRIEND_OF closure. */
  val friendsUndirCte: String =
    "fu AS (SELECT src, dst FROM f0 UNION ALL SELECT dst AS src, src AS dst FROM f0)"

  /** SAME_FAMILY canonical-direction edges (J6 derived-key self-join). */
  val familyCte: String =
    s"fam0 AS (SELECT a.name AS src, b.name AS dst FROM n a JOIN n b " +
      s"ON a.nid % ${Graph.FamilyMod} = b.nid % ${Graph.FamilyMod} AND a.nid < b.nid)"

  /** ENEMY_OF edges, both directions (J8 cross join). */
  val enemiesCte: String =
    s"e1 AS (SELECT a.name AS na, b.name AS nb FROM n a CROSS JOIN n b " +
      s"WHERE a.house = '${Graph.EnemyHouseA}' AND b.house = '${Graph.EnemyHouseB}'), " +
      "en AS (SELECT na AS src, nb AS dst FROM e1 UNION ALL SELECT nb AS src, na AS dst FROM e1)"

  /** ROMANTIC_WITH edges, both directions (J9 curated fuzzy pairs). */
  val romanceCte: String = {
    val values = Graph.Romances
      .map { case (x, y) => s"('${Graph.keyPat(x)}', '${Graph.keyPat(y)}')" }
      .mkString(", ")
    s"pairs(p1, p2) AS (VALUES $values), " +
      "r1 AS (SELECT a.name AS na, b.name AS nb FROM pairs " +
      "JOIN n a ON a.name = p1 OR contains(a.name, p1) " +
      "JOIN n b ON b.name = p2 OR contains(b.name, p2)), " +
      "ro AS (SELECT na AS src, nb AS dst FROM r1 UNION ALL SELECT nb AS src, na AS dst FROM r1)"

  }

  /** All person↔person typed edges, directed as stored. */
  val personEdgesCte: String =
    Seq(friendsCte, familyCte, enemiesCte, romanceCte).mkString(", ") + ", " +
      "pe AS (" +
      "SELECT src, dst, 'FRIEND_OF' AS relType FROM f0 " +
      "UNION ALL SELECT src, dst, 'SAME_FAMILY' AS relType FROM fam0 " +
      "UNION ALL SELECT src, dst, 'ENEMY_OF' AS relType FROM en " +
      "UNION ALL SELECT src, dst, 'ROMANTIC_WITH' AS relType FROM ro)"

  /** Undirected closure over all person edges (symmetric types already
    * stored both ways — only canonical-direction types get reversed). */
  val personEdgesUndirCte: String =
    personEdgesCte + ", " +
      "pu AS (SELECT src, dst, relType FROM pe " +
      "UNION ALL SELECT dst AS src, src AS dst, relType FROM pe " +
      "WHERE relType IN ('FRIEND_OF', 'SAME_FAMILY'))"
}
