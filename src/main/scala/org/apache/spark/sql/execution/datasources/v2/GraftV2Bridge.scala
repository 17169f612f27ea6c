package org.apache.spark.sql.execution.datasources.v2

import org.apache.spark.sql.connector.read.{Scan, V1Scan}

/** The one `private[sql]`-ish DSv2 planning detail graft's runtime
  * filtering needs: `V2ScanRelationPushDown` wraps every [[V1Scan]] in
  * a [[V1ScanWrapper]] (which forwards neither statistics nor the
  * runtime-filtering interfaces), so delivering a runtime filter means
  * unwrapping the graft scan and re-wrapping a filtered replacement
  * with the SAME pushdown bookkeeping. Package-located accessor, same
  * technique as [[org.apache.spark.sql.classic.GraftBridge]].
  */
object GraftV2Bridge {

  /** The wrapped V1 scan, when `scan` is the push-down bridge wrapper. */
  def unwrap(scan: Scan): Option[V1Scan] = scan match {
    case w: V1ScanWrapper => Some(w.v1Scan)
    case _ => None
  }

  /** `orig`'s wrapper around a replacement V1 scan (handled filters and
    * pushed-operator bookkeeping carried over — the replacement reads
    * the same pushed set plus its runtime filter).
    */
  def rewrap(orig: Scan, replacement: V1Scan): Scan = orig match {
    case w: V1ScanWrapper => w.copy(v1Scan = replacement)
    case other => sys.error(s"not a V1ScanWrapper: $other")
  }
}
