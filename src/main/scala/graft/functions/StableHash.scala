package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine's one cross-engine-stable string→integer hash: the
  * first 15 hex chars of md5 as a 60-bit BIGINT, identically
  * computable in DuckDB as
  * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`.
  *
  * Every operator whose output must agree with an external oracle
  * (deterministic sampling, train/val/test splits, the sketch-query
  * md5 cores) derives from THIS definition — changing the width or
  * construction in one caller and not the others would silently
  * break oracle parity, so there is exactly one copy.
  */
object StableHash {
  def md5Int60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")
}
