package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hot signature/similarity
  * kernels. Spark's array higher-order functions evaluate their lambda
  * interpreted, per element, outside whole-stage codegen — for
  * per-token/per-dimension loops (simhash voting, minhash perms,
  * 64-dim dot products) that interpretation dominated the profile. Each
  * expression here generates a single static call into
  * [[Kernels]] (tight JVM loops), stays inside WholeStageCodegen, and
  * reproduces the built-in-composition results bit-for-bit (asserted by
  * NativeExprSpec).
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"
  protected override def nullSafeEval(s: Any): Any =
    Kernels.simhash64(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Kernels.simhash64($c)")
  protected override def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** Unicode NFC normalization as a codegen'd scalar — Spark has no
  * built-in normalizer function (collation-level normalization exists,
  * but not as a value transform), and this is exactly the "built-ins
  * genuinely can't express it" bar for a custom Expression. Null-safe,
  * StringType → StringType, single static call into [[Kernels.nfc]]
  * with an allocation-free already-normalized fast path. */
case class NfcExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"
  protected override def nullSafeEval(s: Any): Any =
    Kernels.nfc(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Kernels.nfc($c)")
  protected override def withNewChildInternal(newChild: Expression): NfcExpr =
    copy(child = newChild)
}

case class ShinglesExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"
  protected override def nullSafeEval(s: Any): Any =
    Kernels.shingles(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Kernels.shingles($c, $k)")
  protected override def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

case class MinHashSigExpr(child: Expression, k: Int, perms: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"
  protected override def nullSafeEval(s: Any): Any =
    Kernels.minhashSig(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, perms)
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Kernels.minhashSig($c, $k, $perms)")
  protected override def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

case class SimHashSha64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64_sha"
  protected override def nullSafeEval(s: Any): Any =
    Kernels.simhash64Sha(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Kernels.simhash64Sha($c)")
  protected override def withNewChildInternal(newChild: Expression): SimHashSha64Expr =
    copy(child = newChild)
}

case class MinHashShaSigExpr(child: Expression, k: Int, perms: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig_sha"
  protected override def nullSafeEval(s: Any): Any =
    Kernels.minhashSigSha(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, perms)
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Kernels.minhashSigSha($c, $k, $perms)")
  protected override def withNewChildInternal(newChild: Expression): MinHashShaSigExpr =
    copy(child = newChild)
}

case class CosineFExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.cosineF(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.Kernels.cosineF($a, $b)")
  protected override def withNewChildrenInternal(l: Expression, r: Expression): CosineFExpr =
    copy(left = l, right = r)
}

case class CosineFDExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine_fd"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.cosineFD(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.Kernels.cosineFD($a, $b)")
  protected override def withNewChildrenInternal(l: Expression, r: Expression): CosineFDExpr =
    copy(left = l, right = r)
}

case class Dist2DExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dist2"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.dist2D(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.Kernels.dist2D($a, $b)")
  protected override def withNewChildrenInternal(l: Expression, r: Expression): Dist2DExpr =
    copy(left = l, right = r)
}

case class IntersectCountExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_intersect_count"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.intersectCount(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.Kernels.intersectCount($a, $b)")
  protected override def withNewChildrenInternal(l: Expression, r: Expression): IntersectCountExpr =
    copy(left = l, right = r)
}

case class LshSignExpr(child: Expression, nPlanes: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lsh_sign"
  protected override def nullSafeEval(a: Any): Any =
    Kernels.lshSign(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], nPlanes)
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Kernels.lshSign($c, $nPlanes)")
  protected override def withNewChildInternal(newChild: Expression): LshSignExpr =
    copy(child = newChild)
}

case class LshSignShaExpr(child: Expression, nPlanes: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lsh_sign_sha"
  protected override def nullSafeEval(a: Any): Any =
    Kernels.lshSignSha(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], nPlanes)
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Kernels.lshSignSha($c, $nPlanes)")
  protected override def withNewChildInternal(newChild: Expression): LshSignShaExpr =
    copy(child = newChild)
}

/** Bloom-filter membership probe over a [[BloomAgg]] bitmap: true iff
  * EVERY bit position in `right` is set in the `left` bitmap — the
  * all-k-hashes test, evaluated as one codegen'd kernel call against
  * the broadcast bitmap bytes (no per-position join rows, no lambda
  * interpretation). Positions are reduced `floorMod(pos, bits)` with
  * `bits = bitmap.length * 8`, matching the aggregate's guard. */
case class BloomContainsExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.bloomContains(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.Kernels.bloomContains($a, $b)")
  protected override def withNewChildrenInternal(l: Expression, r: Expression): BloomContainsExpr =
    copy(left = l, right = r)
}

/** Count-min estimate over a [[CmsAgg]] sketch: min of the counters
  * at the probe's own per-seed indices — the CM upper bound (≥ the
  * true count, never below). One codegen'd kernel call against the
  * broadcast sketch bytes. */
case class CmsEstimateExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.cmsEstimate(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.Kernels.cmsEstimate($a, $b)")
  protected override def withNewChildrenInternal(l: Expression, r: Expression): CmsEstimateExpr =
    copy(left = l, right = r)
}

/** Column-level API over the native expressions. */
object native {
  private def expr(c: Column): Expression = GraftColumnBridge.expression(c)
  def simhash64(text: Column): Column = GraftColumnBridge.column(SimHash64Expr(expr(text)))
  def nfc(text: Column): Column = GraftColumnBridge.column(NfcExpr(expr(text)))
  def simhash64Sha(text: Column): Column = GraftColumnBridge.column(SimHashSha64Expr(expr(text)))
  def minhashSigSha(text: Column, k: Int, perms: Int): Column =
    GraftColumnBridge.column(MinHashShaSigExpr(expr(text), k, perms))
  def shingles(text: Column, k: Int): Column = GraftColumnBridge.column(ShinglesExpr(expr(text), k))
  def minhashSig(text: Column, k: Int, perms: Int): Column =
    GraftColumnBridge.column(MinHashSigExpr(expr(text), k, perms))
  def cosineF(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineFExpr(expr(a), expr(b)))
  def cosineFD(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineFDExpr(expr(a), expr(b)))
  def dist2D(a: Column, b: Column): Column =
    GraftColumnBridge.column(Dist2DExpr(expr(a), expr(b)))
  def intersectCount(a: Column, b: Column): Column =
    GraftColumnBridge.column(IntersectCountExpr(expr(a), expr(b)))
  def lshSign(emb: Column, nPlanes: Int): Column =
    GraftColumnBridge.column(LshSignExpr(expr(emb), nPlanes))
  def lshSignSha(emb: Column, nPlanes: Int): Column =
    GraftColumnBridge.column(LshSignShaExpr(expr(emb), nPlanes))
  /** Misra–Gries heavy-hitters summary (map item → lower-bound weight,
    * at most `capacity` entries) — see [[SpaceSavingAgg]]. */
  def heavyHitters(item: Column, capacity: Int): Column =
    GraftColumnBridge.column(
      SpaceSavingAgg(expr(item), capacity).toAggregateExpression())
  /** Bounded-heap exact top-k pairs by (value desc, id asc) — see
    * [[TopKAgg]]. */
  def topK(value: Column, id: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKAgg(expr(value), expr(id), k).toAggregateExpression())
  /** Fixed-size Bloom bitmap over pre-computed bit positions — see
    * [[BloomAgg]]. */
  def bloomAgg(pos: Column, mBits: Int): Column =
    GraftColumnBridge.column(
      BloomAgg(expr(pos), mBits).toAggregateExpression())
  /** All-positions-set membership probe — see [[BloomContainsExpr]]. */
  def bloomContains(bitmap: Column, positions: Column): Column =
    GraftColumnBridge.column(BloomContainsExpr(expr(bitmap), expr(positions)))
  /** Fixed-size count-min-sketch counters over pre-computed flat
    * (seed, bucket) indices — see [[CmsAgg]]. */
  def cmsAgg(idx: Column, nCounters: Int): Column =
    GraftColumnBridge.column(
      CmsAgg(expr(idx), nCounters).toAggregateExpression())
  /** Min-over-own-seeds count estimate — see [[CmsEstimateExpr]]. */
  def cmsEstimate(sketch: Column, indices: Column): Column =
    GraftColumnBridge.column(CmsEstimateExpr(expr(sketch), expr(indices)))
}

/** Injected optimizer rule: rewrite `size(array_intersect(a, b))`
  * over string arrays to the codegen'd [[IntersectCountExpr]] kernel.
  * The built-in pair materializes the intersection array (O(n·m)
  * nested-loop membership for non-atomic comparisons) only to take
  * its length; the kernel computes the same count hash-based in
  * O(n+m) with no allocation — semantics identical for arbitrary
  * inputs (duplicates count once, null input → null, size's
  * non-legacy null contract). Users writing the natural form get the
  * near-dup verify-join fix automatically. */
object IntersectCountRewrite
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, Size}
  private def stringArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }
  override def apply(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(a, b), legacySizeOfNull)
          if !legacySizeOfNull && stringArray(a) && stringArray(b) =>
        IntersectCountExpr(a, b)
    }
}

/** SparkSessionExtensions injector: exposes the native expressions to
  * SQL (`SELECT graft_simhash64(text) ...`) and installs the
  * [[IntersectCountRewrite]] optimizer rule. Wire with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.expressions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String) =
    new ExpressionInfo(classOf[Kernels.type].getName, name)
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_simhash64"), info("graft_simhash64"),
      (args: Seq[Expression]) => SimHash64Expr(args.head)))
    ext.injectFunction((FunctionIdentifier("graft_cosine"), info("graft_cosine"),
      (args: Seq[Expression]) => CosineFExpr(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_lsh_sign"), info("graft_lsh_sign"),
      (args: Seq[Expression]) => LshSignExpr(args(0), constInt(args, 1, "graft_lsh_sign"))))
    ext.injectFunction((FunctionIdentifier("graft_nfc"), info("graft_nfc"),
      (args: Seq[Expression]) => NfcExpr(args.head)))
    ext.injectFunction((FunctionIdentifier("graft_simhash64_sha"), info("graft_simhash64_sha"),
      (args: Seq[Expression]) => SimHashSha64Expr(args.head)))
    ext.injectFunction((FunctionIdentifier("graft_intersect_count"), info("graft_intersect_count"),
      (args: Seq[Expression]) => IntersectCountExpr(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_heavy_hitters"), info("graft_heavy_hitters"),
      (args: Seq[Expression]) => SpaceSavingAgg(args(0),
        constInt(args, 1, "graft_heavy_hitters")).toAggregateExpression()))
    ext.injectFunction((FunctionIdentifier("graft_topk"), info("graft_topk"),
      (args: Seq[Expression]) => TopKAgg(args(0), args(1),
        constInt(args, 2, "graft_topk")).toAggregateExpression()))
    ext.injectFunction((FunctionIdentifier("graft_bloom_agg"), info("graft_bloom_agg"),
      (args: Seq[Expression]) => BloomAgg(args(0),
        constInt(args, 1, "graft_bloom_agg")).toAggregateExpression()))
    ext.injectFunction((FunctionIdentifier("graft_bloom_contains"), info("graft_bloom_contains"),
      (args: Seq[Expression]) => BloomContainsExpr(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_cms_agg"), info("graft_cms_agg"),
      (args: Seq[Expression]) => CmsAgg(args(0),
        constInt(args, 1, "graft_cms_agg")).toAggregateExpression()))
    ext.injectFunction((FunctionIdentifier("graft_cms_estimate"), info("graft_cms_estimate"),
      (args: Seq[Expression]) => CmsEstimateExpr(args(0), args(1))))
    ext.injectOptimizerRule(_ => IntersectCountRewrite)
  }

  /** Require args(i) to be a foldable integral constant; fail analysis
    * with a named error instead of a ClassCastException/NPE when a
    * BIGINT literal, cast, or non-foldable column is passed. */
  private def constInt(args: Seq[Expression], i: Int, fn: String): Int = {
    val e = args(i)
    def fail(what: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "_LEGACY_ERROR_TEMP_3100",
        messageParameters = Map("message" ->
          s"$fn: argument ${i + 1} must be a constant integer, got $what"),
        cause = None)
    if (!e.foldable) fail(s"non-foldable ${e.sql}")
    e.eval() match {
      case n: Int => n
      case n: Long if n.isValidInt => n.toInt
      case n: Short => n.toInt
      case n: Byte => n.toInt
      case other => fail(String.valueOf(other))
    }
  }
}
