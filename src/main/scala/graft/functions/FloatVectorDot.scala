package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product over two `array<float>` columns, accumulated in
  * double precision in index order.
  *
  * Why a custom Catalyst Expression (SURVEY §7.3): the composable
  * `aggregate(zip_with(...))` HOF formulation allocates an intermediate
  * array and interprets a lambda expression tree per element — measured ~6×
  * slower on the sf0.1 bench (brute-force pair similarity went 12.9s → ~2s).
  * This expression stays inside WholeStageCodegen as a tight primitive loop:
  * no boxing, no allocation, no virtual calls per element.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_vec_dot expects (array<float>, array<float>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  // Null on length mismatch (and on any null element) — matching what the
  // HOF formulation computes, so the VecDotFusion rewrite is exact.
  override def nullable: Boolean = true

  private def elemNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val checkL = elemNullable(left)
    val checkR = elemNullable(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if ((checkL && x.isNullAt(i)) || (checkR && y.isNullAt(i))) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      // Element null checks compile in only when the schema admits null
      // elements; the containsNull=false hot path stays a tight loop.
      val nullCheck =
        (if (elemNullable(left)) s"$a.isNullAt($i) || " else "") +
          (if (elemNullable(right)) s"$b.isNullAt($i) || " else "") + "false"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($nullCheck) { ${ev.isNull} = true; break; }
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session registration for graft's native expressions (Spark 4 removed the
  * public Column(Expression) constructor, so custom expressions are exposed
  * through the function registry + `call_function`). */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def add(name: String)(builder: Seq[org.apache.spark.sql.catalyst.expressions.Expression]
        => org.apache.spark.sql.catalyst.expressions.Expression): Unit =
      // idempotent: re-registering on every call spams "replaced a previously
      // registered function" warnings into the bench/verify logs
      if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "built-in")
    add("graft_vec_dot")(exprs => FloatVectorDot(exprs(0), exprs(1)))
    // Spark ships Bloom-filter expressions for its own runtime filters but
    // does not register them for users; exposed here for the scan-side
    // decontamination prefilter. Insert/test with xxhash64(value).
    add("graft_bloom_agg")(exprs =>
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        exprs(0), exprs(1), exprs(2)).toAggregateExpression())
    add("graft_might_contain")(exprs =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        exprs(0), exprs(1)))
    // args: (text, table literal array<long>[16384], defaults literal
    // array<long>[128], emptyCtx literal long) — the model rides the CALL
    // as foldable literals and is folded into the expression's plain
    // long[] fields here, so the generated loop indexes raw arrays (the
    // registry builder is the only Column-from-Expression route Spark 4
    // leaves open, and it cannot carry non-Expression constructor data).
    def longs(e: org.apache.spark.sql.catalyst.expressions.Expression): Array[Long] =
      e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray()
    add("graft_bigram_score") { exprs =>
      BigramLmScore(exprs(0), longs(exprs(1)), longs(exprs(2)),
        exprs(3).eval(null).asInstanceOf[Long])
    }
    // args: (text, weights literal array<long>, width literal int) — same
    // literal-folding route as graft_bigram_score
    add("graft_quality_score") { exprs =>
      QualityClassifierScore(exprs(0), longs(exprs(1)),
        exprs(2).eval(null).asInstanceOf[Int])
    }
  }

  /** Dot product Column over two array<float> columns. */
  def vecDot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("graft_vec_dot", a, b)
  }
}
