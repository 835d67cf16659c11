package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable hashing primitives shared by the CDC range-hash and dedup
  * operators.
  *
  * Everything is built from `md5` because Spark's `md5` and DuckDB's
  * `md5` agree bit-for-bit, which lets the driver's DuckDB oracle
  * hash-check operators that *contain* hashes. Spark-side the 64-bit
  * derivation is `conv(substr(md5(x),1,15),16,10)` (codegen'd
  * built-ins, no UDF); DuckDB-side it is
  * `('0x' || substr(md5(x),1,15))::BIGINT`. 15 hex chars = 60 bits,
  * so the value is non-negative and fits a signed 64-bit on both
  * engines.
  */
object Hashing {

  /** True when the native prefix-hash expressions are registered on
    * the active session (graft.functions.GraftExtensions) — the
    * graft_dot probe-and-fall-back discipline: identical values either
    * way, the native path just skips the hex render + re-parse.
    *
    * The probe is cached PER SESSION (weak keys — a retired session
    * must stay collectable): hash-family loops construct dozens of
    * these columns and a catalog functionExists lookup per column is
    * measurable driver work. Extensions are fixed at session build, so
    * the cached answer cannot go stale for a given session; a Column
    * built on one session and analyzed on another differently-
    * configured one was already unsupported (the plan would carry the
    * other session's registration) and remains so.
    */
  private val nativeProbe =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, java.lang.Boolean]())

  private def nativeHash: Boolean =
    org.apache.spark.sql.SparkSession.getActiveSession.exists { s =>
      val cached = nativeProbe.get(s)
      if (cached != null) cached.booleanValue()
      else {
        val v = s.catalog.functionExists("graft_h64")
        nativeProbe.put(s, java.lang.Boolean.valueOf(v))
        v
      }
    }

  /** 60-bit non-negative portable hash of a string column. */
  def portableHash64(c: Column): Column =
    if (nativeHash) call_function("graft_h64", c)
    else conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Portable hash seeded by an integer — gives an indexed hash family
    * h_i(x) = portableHash64(i || ':' || x) for MinHash signatures.
    */
  def seededHash64(seed: Int, c: Column): Column =
    portableHash64(concat(lit(seed.toString), lit(":"), c))

  /** 32-bit-range portable hash (first 8 hex chars): small enough that
    * per-bucket SUMs of many of them stay well inside a signed 64-bit
    * range on both engines (used by the commutative range hash).
    */
  def portableHash32(c: Column): Column =
    if (nativeHash) call_function("graft_h32", c)
    else conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Universal-hash family constants: the affine family
    * h_j(x) = (a_j·h₃₀(x) + b_j) mod P with per-j coefficients drawn
    * from md5(j) and h₃₀ = portableHash64 mod 2³⁰. Products stay below
    * 2⁶⁰ (no int64 overflow), values below 2³¹ (so an 8-value band sum
    * is < 2³⁴), and one md5 per x covers the whole family. A family
    * linear IN j would correlate adjacent hashes and inflate LSH
    * false-positive candidates; independent per-j coefficients are the
    * standard construction (cf. Spark MLlib MinHashLSH).
    */
  val affinePrime: Long = 2147483647L // 2^31 - 1
  val affineRange: Long = 1073741824L // 2^30

  /** 30-bit-range portable hash (input to the affine family). */
  def portableHash30(c: Column): Column =
    pmod(portableHash64(c), lit(affineRange))

  /** Per-index coefficient a_j or b_j of the affine family. */
  def affineCoef(prefix: String, jCol: Column): Column =
    pmod(portableHash64(concat(lit(prefix + ":"), jCol.cast("string"))), lit(affineRange))

  /** The same coefficient as a Scala constant — identical md5-derived
    * arithmetic evaluated driver-side, so plan-time literals (the wide
    * MinHash aggregation) match the Column/SQL family bit-for-bit
    * (equality pinned in FunctionsSpec).
    */
  def affineCoefConst(prefix: String, j: Int): Long =
    portableHash64Const(s"$prefix:$j") % affineRange

  /** [[portableHash64]] evaluated driver-side — identical md5
    * arithmetic, for plan-time literals (MinHash coefficients, the
    * random-projection sign matrix) that must match the Column/SQL
    * derivation bit-for-bit.
    */
  def portableHash64Const(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** h_j(x) given a precomputed h₃₀ column and coefficient columns. */
  def affineHash(h30: Column, aj: Column, bj: Column): Column =
    pmod(aj * h30 + bj, lit(affinePrime))
}
