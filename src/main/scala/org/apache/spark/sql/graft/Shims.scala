package org.apache.spark.sql.graft

import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.internal.connector.PredicateUtils
import org.apache.spark.sql.sources.Filter

/** Package-placement shim (the standard connector pattern — Delta and
  * Iceberg ship the same kind of bridge): `PredicateUtils` is
  * `private[sql]`, and hand-rolling the V2-Predicate → V1-Filter
  * translation would re-implement (and drift from) Spark's own tested
  * converter — literal externalization, type coercion, null semantics.
  * Nothing else may land in this package. */
object ShimPredicateUtils {
  def toV1(p: Predicate): Option[Filter] = PredicateUtils.toV1(p)
}
