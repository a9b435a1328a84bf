package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric helpers shared by the query inventory. */
object Num {

  /** Epoch microseconds of a timestamp column. Testdata timestamps load as
    * TIMESTAMP_NTZ (parquet isAdjustedToUTC=false); with the session TZ
    * pinned to UTC the cast is an identity relabel, and the result matches
    * DuckDB's `epoch_us` on the same naive values. Timestamps cross the
    * oracle compare as these integers, never as raw timestamp encodings.
    */
  def epochUs(c: Column): Column =
    unix_micros(c.cast(org.apache.spark.sql.types.TimestampType))

  /** Half-away-from-zero rounding computed on the scaled binary double:
    * `floor(x * 10^d + 0.5) / 10^d` (mirrored for negatives).
    *
    * This is bit-identical to DuckDB's `round()` given identical input
    * bits (verified empirically over the testdata). Spark's own
    * `round`/`bround` instead convert through `BigDecimal.valueOf`, i.e.
    * the SHORTEST decimal representation of the double, which disagrees
    * with binary-value rounding on ~0.2% of price-like values — enough to
    * fail a hash compare. All in-query rounding uses this helper so the
    * oracle's plain `round(x, d)` matches exactly.
    *
    * Whole-stage-codegen friendly: compiles to a when/floor/divide
    * expression tree, no UDF.
    */
  /** Negative inputs that round to zero must yield NEGATIVE zero: DuckDB's
    * `round` preserves the sign bit (round(-1e-6, 4) = -0.0), and the
    * driver's hash sees the byte difference even though -0.0 == 0.0
    * (round-3 q61 failed on exactly this). The unary minus keeps the sign;
    * `lit(0.0) - x` would normalize it away. ±0.0 and NaN pass through as
    * themselves via the otherwise branch, same as DuckDB.
    */
  def roundAt(c: Column, d: Int): Column = {
    val p = math.pow(10, d)
    when(c > 0, floor(c * p + 0.5) / p)
      .when(c < 0, negate(floor(lit(0.0) - c * p + 0.5) / p))
      .otherwise(c)
  }
}
