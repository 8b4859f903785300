package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The shared deterministic 32-bit hash: first 8 hex chars of an md5 hex
  * string folded into one exact BIGINT. This is the ONE hash definition
  * behind every cross-engine-deterministic decision in the library —
  * weighted sampling ([[graft.ops.Sampling.sampleWeighted]]), feature
  * hashing ([[graft.ops.Text.textHashingVectorizer]]) — and
  * `graft.ExtraSql.hexFold` generates the character-identical DuckDB
  * expression, so any drift between the Scala and SQL folds is a
  * single-definition bug, not a scattered one.
  */
object HexFold {

  /** Fold the first 8 hex chars of `hexMd5` (an md5(...) column) into a
    * non-negative BIGINT in [0, 2^32).
    *
    * Implementation note: this must reference `hexMd5` exactly ONCE. The
    * original per-nibble formulation (8 × substring + CASE + ascii)
    * referenced it up to 24 times, and Catalyst's projection collapse
    * inlines the argument at every reference — for callers passing a raw
    * `md5(...)` expression that meant up to 24 md5 evaluations per row
    * (measured as the dominant cost of the spatial join's point
    * synthesis). `conv(hex, 16, 10)` is the same value with one md5.
    * The DuckDB twin (`ExtraSql.hexFold`) binds a named CTE column, so
    * its per-nibble arithmetic never had the blow-up — values match
    * either way.
    */
  def u32(hexMd5: Column): Column =
    conv(substring(hexMd5, 1, 8), 16, 10).cast("long")
}
