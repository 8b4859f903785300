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
    */
  def u32(hexMd5: Column): Column =
    (0 until 8).map { i =>
      val c = substring(hexMd5, i + 1, 1)
      when(c >= "a", ascii(c) - 87).otherwise(ascii(c) - 48)
        .cast("long") * lit(1L << (4 * (7 - i)))
    }.reduce(_ + _)
}
