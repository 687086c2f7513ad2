package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd dot product over two `array<double>` columns.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) evaluate their
  * lambdas interpreted, one boxed element at a time — at N² pair volume
  * (embedding near-dup / ANN re-rank) that dominates the query. This
  * expression compiles to a tight primitive loop inside whole-stage
  * codegen: same left-to-right add order as the lambda version and the
  * DuckDB oracle (`list_reduce(list_prepend(0, list_transform(...)))`), so
  * results stay bit-for-bit identical while running ~10× faster.
  *
  * Null contract (matches the lambda form exactly): null input array →
  * null; MISMATCHED lengths → null (`zip_with` NULL-pads the short side,
  * which nulls the aggregate — a ragged/corrupt embedding must surface as
  * NULL, not a plausible partial sum); null *elements* are read as 0.0
  * (embeddings never carry null elements; documented rather than checked to
  * keep the loop branch-free).
  */
case class ArrayDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_dot requires two array<double> arguments, got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "array_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native one-pass 32-bit SimHash over an `array<bigint>` of token hashes.
  *
  * Replaces 32 interpreted `aggregate(...)` lambdas (one per bit — 32
  * passes over the array per row) with a single codegen'd loop. Semantics
  * identical to the lambda form and the DuckDB oracle: bit j of the result
  * is set iff strictly more elements have bit j set than not.
  */
case class ArraySimhash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash32 requires array<bigint>, got ${t.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val counts = new Array[Int](32)
    var i = 0
    while (i < arr.numElements()) {
      val h = arr.getLong(i)
      var j = 0
      while (j < 32) {
        if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 32) { if (counts(j) > 0) fp |= (1L << j); j += 1 }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val j2 = ctx.freshName("j2")
      val h = ctx.freshName("h")
      val fp = ctx.freshName("fp")
      s"""
         |int[] $counts = new int[32];
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  long $h = $arr.getLong($i);
         |  for (int $j = 0; $j < 32; $j++) {
         |    if ((($h >> $j) & 1L) == 1L) $counts[$j]++; else $counts[$j]--;
         |  }
         |}
         |long $fp = 0L;
         |for (int $j2 = 0; $j2 < 32; $j2++) { if ($counts[$j2] > 0) $fp |= (1L << $j2); }
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static hash kernels shared by the expressions below and callable from
  * generated code (codegen emits fully-qualified static calls). */
object HashKernels {
  final val P = 1000000007L

  /** Polynomial rolling hash over Unicode code points:
    * `h := (h*31 + cp) mod P` — bit-identical to the SQL lambda form
    * (`aggregate(transform(sequence(1, length(w)), i -> ascii(substring(w, i, 1))), ...)`)
    * and to DuckDB's `list_reduce` twin for all BMP+ text. */
  def polyHash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  /** MinHash permutation parameters (16 signatures). Referenced by both the
    * [[MinHashSigs]] expression and the DuckDB oracle builder so the two
    * engines always agree. */
  val MinHashA: Array[Long] = Array(
    387L, 1031L, 2693L, 4621L, 6151L, 8117L, 10243L, 12289L,
    14341L, 16411L, 18427L, 20483L, 22531L, 24593L, 26641L, 28657L)
  val MinHashB: Array[Long] = Array(
    12553L, 92837L, 5171L, 3359L, 7699L, 263L, 90749L, 4349L,
    65537L, 11261L, 557L, 80021L, 9619L, 36341L, 709L, 52361L)

  /** 16-slot MinHash signature over an array of shingle hashes, one pass:
    * sig_i = min over h of (a_i*h + b_i) mod P. Empty input → all slots
    * Long.MaxValue (a sentinel no real hash reaches; in practice shingle
    * arrays are non-empty by construction — short texts fall back to the
    * whole-text shingle — so the sentinel never escapes). */
  def minhashSigs(hashes: ArrayData): Array[Long] = {
    val n = hashes.numElements()
    val sig = Array.fill(16)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var p = 0
      while (p < 16) {
        val v = (MinHashA(p) * h + MinHashB(p)) % P
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      i += 1
    }
    sig
  }

  /** Deterministic pseudo-random hyperplane weight for (plane p, dim d):
    * an LCG step followed by a QUADRATIC mix, mapped to [-0.5, 0.5). The
    * SAME integer math as the DuckDB oracle's `planeWeightSql` (Long ==
    * BIGINT, exact, never overflows: s < 2^31 so s*s < 2^62), so both
    * engines project onto bit-identical planes.
    *
    * The quadratic step is load-bearing, found at the sf1 scale rehearsal:
    * a bare LCG's consecutive outputs lie on a coarse lattice, so the
    * 8-dim weight prefixes of "independent" planes were directionally
    * clustered (mean pairwise |cos| 0.63, a third of pairs above 0.9) —
    * on low-rank inputs (the 8-dim multimodal features) 20-bit bands
    * then collapsed to a few effective bits and chance candidates grew
    * quadratically (measured 3.9% pair collision vs 0.06% after mixing,
    * a 67× candidate cut at equal recall; squaring breaks the lattice
    * because the composition of linear congruences is linear, a square
    * is not). */
  def planeWeight(p: Int, d: Int): Double = {
    val s = (1103515245L * (p * 64L + d) + 12345L) % 2147483648L
    (((s * s) % 2147483648L * 31L + s) % 2147483648L).toDouble / 2147483648.0 - 0.5
  }

  /** Largest plane index any kernel will read. Sized for the size-adaptive
    * dup banding ([[graft.llmdata.Similarity.dupBanding]]): its steepest
    * rung is 31 bands × 17 bits = 527 planes; 1024 leaves headroom. The
    * table is 1024×64 doubles = 512 KB per JVM — still negligible. */
  final val MaxPlanes = 1024

  /** Plane table precomputed once per JVM ([[MaxPlanes]] planes × 64 dims)
    * so the per-row signature loop reads a double[] instead of re-running
    * the LCG 64×planes times per vector. */
  private val PlaneTable: Array[Array[Double]] =
    Array.tabulate(MaxPlanes, 64)(planeWeight)

  /** The signature's pinned dimensionality. The plane-weight index is
    * `p*64 + d`, so weights for d >= 64 would COLLIDE with plane p+1's
    * low dims (correlated "independent" hyperplanes), and the DuckDB twin
    * hardcodes 64 terms — a non-64-dim vector therefore signs out as 0,
    * exactly like the literal-plane `array_dot` form this kernel replaced
    * (length mismatch → NULL dot → every bit 0). */
  final val SigDims = 64

  /** Random-hyperplane LSH signature: bit p set iff dot(v, plane_p) >= 0.
    * One pass per plane in dim-ascending order — the identical IEEE add
    * sequence as the literal-plane `array_dot` form this replaces and as
    * the DuckDB `list_reduce` twin, so signatures are bit-equal. Defined
    * only for [[SigDims]]-dim vectors; anything else returns 0 (see
    * [[SigDims]]). */
  def hyperplaneSig(v: ArrayData, planes: Int): Long = {
    if (v.numElements() != SigDims) return 0L
    var sig = 0L
    var p = 0
    while (p < planes) {
      val row = PlaneTable(p)
      var s = 0.0
      var d = 0
      while (d < SigDims) {
        s += v.getDouble(d) * row(d)
        d += 1
      }
      if (s >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** One BAND of a hyperplane signature: bit i (0 ≤ i < count) is set iff
    * dot(v, plane_{offset+i}) >= 0 — the same planes, same dim-ascending
    * IEEE add order as [[hyperplaneSig]], just starting at an arbitrary
    * plane. `hyperplaneSigAt(v, c*r, r)` therefore equals
    * `(hyperplaneSig(v, b*r) >> (c*r)) & ((1<<r)-1)` wherever both are
    * defined — but unlike the packed form, total planes (bands × bits) is
    * bounded by [[MaxPlanes]], not by the 63 bits of one BIGINT. This is
    * what lets the dup banding follow N (r ∝ log N needs b ≈ N^ρ bands to
    * hold recall — 23×15 = 345 planes at 200 k vectors, far past 63). */
  def hyperplaneSigAt(v: ArrayData, offset: Int, count: Int): Long = {
    if (v.numElements() != SigDims) return 0L
    var sig = 0L
    var i = 0
    while (i < count) {
      val row = PlaneTable(offset + i)
      var s = 0.0
      var d = 0
      while (d < SigDims) {
        s += v.getDouble(d) * row(d)
        d += 1
      }
      if (s >= 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /** Random-hyperplane PROJECTION: the raw dots with planes [0, planes) —
    * what [[hyperplaneSig]] signs, kept as doubles (the random-projection
    * coarse space of `rpTopK`). Same [[PlaneTable]], same dim-ascending
    * IEEE add order, so projections are bit-identical to the
    * `aggregate(transform(...))` lambda form this replaces and to the
    * DuckDB `list_reduce` twin. Null (not a partial value) for non-64-dim
    * input, mirroring the kernels above: a ragged embedding must surface,
    * not project onto a weight prefix that collides with plane p+1. */
  def rpProject(v: ArrayData, planes: Int): Array[Double] = {
    if (v.numElements() != SigDims) return null
    val out = new Array[Double](planes)
    var p = 0
    while (p < planes) {
      val row = PlaneTable(p)
      var s = 0.0
      var d = 0
      while (d < SigDims) {
        s += v.getDouble(d) * row(d)
        d += 1
      }
      out(p) = s
      p += 1
    }
    out
  }
}

/** Codegen'd per-element polynomial hash: `array<string>` → `array<bigint>`.
  * Replaces the interpreted nested `transform(w, aggregate(...))` lambdas
  * that every text operator (shingling, fingerprint, simhash, minhash) runs
  * per token.
  *
  * Null elements map to null elements (like `list_transform` in the DuckDB
  * oracle). The null check only exists when the child's type says elements
  * CAN be null — the library's own token arrays are containsNull=false, so
  * their loop stays primitive and branch-free. */
case class ArrayPolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"poly_hash_array requires array<string>, got ${t.sql}")
  }

  private def elementsNullable: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = elementsNullable)
  override def prettyName: String = "poly_hash_array"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (elementsNullable) {
      val out = new Array[Any](arr.numElements())
      var i = 0
      while (i < out.length) {
        out(i) = if (arr.isNullAt(i)) null else HashKernels.polyHash(arr.getUTF8String(i))
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new Array[Long](arr.numElements())
      var i = 0
      while (i < out.length) {
        out(i) = HashKernels.polyHash(arr.getUTF8String(i))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      if (elementsNullable)
        s"""
           |Object[] $out = new Object[$arr.numElements()];
           |for (int $i = 0; $i < $out.length; $i++) {
           |  $out[$i] = $arr.isNullAt($i) ? null
           |    : (Object) java.lang.Long.valueOf(graft.functions.HashKernels.polyHash($arr.getUTF8String($i)));
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      else
        s"""
           |long[] $out = new long[$arr.numElements()];
           |for (int $i = 0; $i < $out.length; $i++) {
           |  $out[$i] = graft.functions.HashKernels.polyHash($arr.getUTF8String($i));
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd one-pass 16-slot MinHash signature: `array<bigint>` →
  * `array<bigint>`. Replaces 16 interpreted `array_min(transform(...))`
  * lambdas (16 passes over the shingle hashes per row). */
case class MinHashSigs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sigs requires array<bigint>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(HashKernels.minhashSigs(v.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.functions.HashKernels.minhashSigs($arr));"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Random-hyperplane LSH signature over an `array<double>` embedding: bit
  * p (0 ≤ p < planes) of the result is set iff dot(v, plane_p) >= 0, with
  * the deterministic LCG planes of [[HashKernels.planeWeight]].
  *
  * Exists for codegen WEIGHT, not just speed: the literal-plane form this
  * replaces embedded planes×64 double literals in every LSH query's
  * generated code — ~2 s of janino compile billed to each cold run. This
  * compiles once (the kernel is a static JVM method) and the generated
  * call site is three lines. Same dim-ascending add order, so signatures
  * are bit-identical to the literal form and the DuckDB oracle.
  *
  * Null contract (as [[ArrayDot]]): null array → null; null elements are
  * read as 0.0 (embeddings never carry null elements). */
case class ArrayHyperplaneSig(child: Expression, planes: Int) extends UnaryExpression {
  require(planes >= 1 && planes <= 63, s"hyperplane_sig planes must be in [1, 63], got $planes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hyperplane_sig requires array<double>, got ${t.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  override def nullSafeEval(v: Any): Any =
    HashKernels.hyperplaneSig(v.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.HashKernels.hyperplaneSig($arr, $planes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One band of a hyperplane signature ([[HashKernels.hyperplaneSigAt]]):
  * bits of planes [offset, offset+count) as a BIGINT. The per-band form of
  * [[ArrayHyperplaneSig]] — band values are bit-identical to extracting the
  * same bit range from the packed signature, but the TOTAL plane budget is
  * [[HashKernels.MaxPlanes]] instead of 63, which is what the size-adaptive
  * dup banding needs (bands × bits grows with corpus size). */
case class ArrayHyperplaneSigAt(child: Expression, offset: Int, count: Int)
    extends UnaryExpression {
  require(count >= 1 && count <= 63,
    s"hyperplane_sig_at count must be in [1, 63], got $count")
  require(offset >= 0 && offset + count <= HashKernels.MaxPlanes,
    s"hyperplane_sig_at planes [$offset, ${offset + count}) outside [0, ${HashKernels.MaxPlanes})")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hyperplane_sig_at requires array<double>, got ${t.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig_at"

  override def nullSafeEval(v: Any): Any =
    HashKernels.hyperplaneSigAt(v.asInstanceOf[ArrayData], offset, count)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.HashKernels.hyperplaneSigAt($arr, $offset, $count);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Random-hyperplane projection ([[HashKernels.rpProject]]): the dots of a
  * 64-dim embedding with planes [0, planes) as `array<double>` — the
  * codegen-weight fix for `rpTopK`'s coarse space, same rationale as
  * [[ArrayHyperplaneSig]]: the lambda form it replaces re-ran the LCG
  * weight formula planes×64 times per row through interpreted
  * higher-order functions AND billed its janino compile to every cold
  * run. Null for non-64-dim input (see [[HashKernels.SigDims]]). */
case class ArrayRpProject(child: Expression, planes: Int) extends UnaryExpression {
  require(planes >= 1 && planes <= HashKernels.MaxPlanes,
    s"rp_project planes must be in [1, ${HashKernels.MaxPlanes}], got $planes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"rp_project requires array<double>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "rp_project"

  override def nullSafeEval(v: Any): Any = {
    val out = HashKernels.rpProject(v.asInstanceOf[ArrayData], planes)
    if (out == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val tmp = ctx.freshName("rp")
      s"""double[] $tmp = graft.functions.HashKernels.rpProject($arr, $planes);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($tmp);
         |}""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExprs {
  /** Registers the custom expressions in the session's function registry so
    * plans can use them via `expr("array_dot(a, b)")` etc. — the defensive
    * path for sessions built without [[GraftExtensions]]. Idempotent:
    * already-registered names are skipped. */
  def register(spark: SparkSession): Unit =
    GraftExtensions.functions.foreach { case (id, info, builder) =>
      if (!spark.sessionState.functionRegistry.functionExists(id)) {
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
      }
    }
}
