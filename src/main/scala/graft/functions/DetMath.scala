package graft.functions

/** Deterministic transcendental kernels for oracle-exact metrics.
  *
  * The driver's correctness gate hash-compares DOUBLES bit-for-bit, and
  * library ln implementations are NOT bit-stable across engines: measured
  * on this box, `java.lang.Math.log` and DuckDB's `ln` disagree by 1 ulp
  * on 24 of the 1 000 000 integer inputs a ppm-scaled metric can produce
  * — rare enough to pass a fixture by luck and fail the next regenerate.
  * So metrics that need a log (PSI, the population-stability drift
  * summary) use THIS kernel on both sides instead: only IEEE-754
  * exactly-rounded operations (+, −, ×, ÷) plus an exact power-of-two
  * scaling, evaluated in the same order — any conforming engine produces
  * the same double (validated: 0 bit differences between the JVM fold and
  * DuckDB SQL over the full 1..10⁶ domain).
  *
  * `detLn(n)` for INTEGER n ≥ 1: range-reduce with m = ⌊log₂ n⌋ (an
  * integer, from the binary digit count), f = n / 2^m ∈ [1, 2) (division
  * by a power of two is exact), then the atanh series in
  * y = (f−1)/(f+1) ∈ [0, 1/3): ln f = 2·(y + y³/3 + … + y¹⁵/15).
  * Truncation error < 5e-10 relative — an approximation CONSTANT both
  * engines share, not a per-engine rounding. ln n = m·ln 2 + ln f with
  * ln 2 as the correctly-rounded double literal.
  */
object DetMath {

  /** ln 2 as the decimal literal both engines parse to the same double
    * (string→double parsing is correctly rounded in the JVM and DuckDB). */
  val Ln2Literal = "0.6931471805599453"
  val Ln2: Double = Ln2Literal.toDouble

  private val SeriesDenoms = Seq(3, 5, 7, 9, 11, 13, 15)

  /** JVM evaluation — bit-identical to the SQL forms ([[seriesSql]] /
    * [[detLnSql]]) because every step is the same exactly-rounded IEEE op
    * in the same order. Used to fold BASELINE-side values on the driver
    * (stats-as-data) so the streaming plan carries them as literals. */
  def detLn(n: Long): Double = {
    require(n >= 1, s"detLn domain is n >= 1, got $n")
    val m = 63 - java.lang.Long.numberOfLeadingZeros(n)
    val f = n.toDouble / (1L << m).toDouble
    val y = (f - 1.0) / (f + 1.0)
    val y2 = y * y
    var pow = y
    var s = y
    SeriesDenoms.foreach { kk => pow = pow * y2; s = s + pow / kk.toDouble }
    m.toDouble * Ln2 + 2.0 * s
  }

  /** The atanh series as SQL text over a (short) variable name `y` — the
    * SAME text feeds the Spark lambda and the DuckDB twin so the op
    * sequence cannot drift between them. (y*y) is re-derived per term
    * rather than bound to a temp: SQL lambdas have no let, and recomputing
    * an exact product changes nothing.) */
  def seriesSql(y: String): String = {
    var pow = y
    var s = y
    SeriesDenoms.foreach { kk =>
      pow = s"($pow * ($y * $y))"
      s = s"($s + $pow / CAST($kk AS DOUBLE))"
    }
    s
  }

  /** ln 2 multiply-accumulate step as SQL: m·ln2 + 2·s, from the integer
    * floor-log2 `m` and series value `s` expressions. */
  def lnFromPartsSql(m: String, s: String): String =
    s"((CAST($m AS DOUBLE) * CAST('$Ln2Literal' AS DOUBLE)) + (CAST(2 AS DOUBLE) * $s))"

  /** Integer floor-log2 as SQL — binary digit count, no floating log. */
  def floorLog2Sql(v: String): String = s"(length(bin($v)) - 1)"
}
