package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Deterministic cross-engine primitives shared by the dedup / similarity
  * / text operators.
  *
  * Every approximate-dedup and similarity query in this engine is
  * oracle-checked against DuckDB, which requires the two engines to
  * compute IDENTICAL bits. Three rules make that possible:
  *
  *   1. All hashing goes through `md5` (identical digest in every
  *      engine), truncated to 7 or 8 hex chars and parsed as an integer —
  *      never engine-private hashes (Spark's murmur3 `hash()` or DuckDB's
  *      `hash()` would diverge).
  *   2. All floating-point reductions are LEFT FOLDS in array order
  *      (Spark `aggregate`, DuckDB `list_reduce`): same operand order →
  *      identical IEEE-754 bits, so even `round(x, 6)` can't flip.
  *   3. All "randomness" (MinHash permutations, LSH hyperplanes) derives
  *      from integer arithmetic on fixed constants (Knuth multiplicative
  *      hashing), exact in int64 on both engines.
  *
  * Everything here compiles to Catalyst higher-order-function expression
  * trees — no UDFs, codegen-eligible, fully distributed.
  */
object Det {

  /** Mersenne prime 2^31-1: modulus for MinHash permutations. With 28-bit
    * token hashes, a*h+b stays < 2^59 — no int64 overflow on either
    * engine.
    */
  val MinHashP = 2147483647L

  /** Knuth's multiplicative constant (2654435761 = 2^32 * golden ratio). */
  val Knuth = 2654435761L

  /** 28-bit deterministic string hash: first 7 hex chars of md5.
    * DuckDB twin: `CAST(concat('0x', substring(md5(s),1,7)) AS BIGINT)`.
    */
  def h7(c: Column): Column =
    conv(substring(md5(c), 1, 7), 16, 10).cast(LongType)

  /** The j-th MinHash permutation (j is a 0-based int Column) applied to a
    * 28-bit hash h: `(a_j * h + b_j) mod P` with a_j, b_j derived from j
    * by integer arithmetic. DuckDB twin uses the same literal formula.
    * Reference formulation for the native MinHashSig expression —
    * NativeExprSpec pins the two bit-identical.
    */
  def minhashPerm(j: Column, h: Column): Column =
    (((j + 1).cast(LongType) * Knuth % MinHashP) * h +
      (j + 1).cast(LongType) * 40503L % MinHashP) % MinHashP

  /** Cast a float array to double — products and folds then run in f64 on
    * both engines (DuckDB twin: `list_transform(v, x -> CAST(x AS DOUBLE))`).
    */
  def toDoubleArr(c: Column): Column = transform(c, _.cast(DoubleType))

  /** Left-fold dot product over two equal-length double arrays. Operand
    * order matches DuckDB's `list_reduce(list_transform(...), (x,y) -> x+y)`
    * making the result bit-identical across engines.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm via the same left fold (sqrt is correctly rounded IEEE-754 —
    * identical bits given identical input).
    */
  def l2norm(a: Column): Column = sqrt(dot(a, a))
}
