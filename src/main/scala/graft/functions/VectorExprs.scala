package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the embedding dot product — the hot
  * scalar of similarity search. `aggregate(zip_with(...))` builds an
  * intermediate array per row and walks it through two higher-order-
  * function frames; this expression is a single fused loop with `doGenCode`
  * so the whole cosine stays inside one WholeStageCodegen span
  * (preference order (b) of the build brief: custom Expression before
  * custom operator). Sum order is left-to-right sequential — identical to
  * the fold the DuckDB oracle mirrors, so results stay bit-compatible.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // per-side element accessor: float and double arrays both accepted
  // (a normalized copy is array<double>; raw embeddings array<float>)
  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def get(arr: ArrayData, i: Int, dbl: Boolean): Double =
    if (dbl) arr.getDouble(i) else arr.getFloat(i).toDouble

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (xd, yd) = (isDoubleArray(left), isDoubleArray(right))
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += get(x, i, xd) * get(y, i, yd)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      def acc(v: String, e: Expression) =
        if (isDoubleArray(e)) s"$v.getDouble($i)" else s"(double) $v.getFloat($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double acc_${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  acc_${ev.value} += ${acc(a, left)} * ${acc(b, right)};
         |}
         |${ev.value} = acc_${ev.value};
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Native Hamming distance between two lowercase-hex digest strings
  * (e.g. 16-char simhash64 values): per character, XOR the decoded
  * nibbles and popcount — one fused loop with `doGenCode`, replacing a
  * 16-term conv/substr/xor Column tree in the near-dup verify filter
  * (which runs once per CANDIDATE pair — billions of rows at corpus
  * scale). Bit-identical to [[graft.operators.DedupOps.hammingHex64]]
  * on the hex domain (property-pinned); non-hex characters decode to 0,
  * lengths compare up to the shorter string.
  */
case class HammingHex(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.unsafe.types.UTF8String

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String].getBytes
    val y = b.asInstanceOf[UTF8String].getBytes
    val n = math.min(x.length, y.length)
    var acc = 0
    var i = 0
    while (i < n) {
      acc += java.lang.Integer.bitCount(
        (HammingHex.nibble(x(i)) ^ HammingHex.nibble(y(i))) & 0xf)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val xa = ctx.freshName("xa")
      val yb = ctx.freshName("yb")
      val cls = classOf[HammingHex].getName
      s"""
         |byte[] $xa = $a.getBytes();
         |byte[] $yb = $b.getBytes();
         |int $n = java.lang.Math.min($xa.length, $yb.length);
         |int acc_${ev.value} = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  acc_${ev.value} += java.lang.Integer.bitCount(
         |    ($cls.nibble($xa[$i]) ^ $cls.nibble($yb[$i])) & 0xf);
         |}
         |${ev.value} = acc_${ev.value};
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingHex =
    copy(left = newLeft, right = newRight)
}

object HammingHex {
  /** Lowercase-hex nibble decode; anything else → 0 (matches `conv`'s
    * treatment closely enough on the digest domain, which is all this is
    * defined for). Public static for the generated code.
    */
  def nibble(c: Byte): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else 0
}

object VectorExprs {
  val FnName = "graft_vec_dot"
  val HammingFnName = "graft_hamming_hex"

  /** Idempotently register the expressions with the session's function
    * registry (Spark 4 keeps Column↔Expression bridging private, so the
    * registry + `call_function` is the public route). A session that
    * already has both names skips the replace — `createOrReplaceTemp
    * Function` logs a "replacing" warning per call, and queries register
    * lazily, so a 57-query bench pass would otherwise emit hundreds of
    * lines of registry noise.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def has(n: String) = reg.functionExists(
      org.apache.spark.sql.catalyst.FunctionIdentifier(n))
    if (!has(FnName))
      reg.createOrReplaceTempFunction(
        FnName, exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    if (!has(HammingFnName))
      reg.createOrReplaceTempFunction(
        HammingFnName, exprs => HammingHex(exprs(0), exprs(1)), "built-in")
  }

  /** Dot product of two array<float> columns ([[register]] first). */
  def dot(a: Column, b: Column): Column = call_function(FnName, a, b)

  /** Hamming distance of two hex-digest columns ([[register]] first). */
  def hammingHex(a: Column, b: Column): Column = call_function(HammingFnName, a, b)
}
