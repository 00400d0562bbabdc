package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native product-quantization encoder: maps an `array<double>` vector
  * to its `m` per-subspace nearest-codebook codes (`array<int>`).
  *
  * The declarative formulation (per subspace: `array_sort` over k
  * (distance, code) structs, each distance a `zip_with`+`aggregate`
  * dot) is m·k inline sub-expressions — at m=16, k=16 that is 256
  * unrolled dot products, which blows janino's 64 KB method limit and
  * silently drops the whole stage out of codegen. This expression is
  * the same argmin as one tight three-level loop over the flattened
  * codebook, embedded as a reference object — constant code size for
  * ANY (m, k), inside whole-stage codegen.
  *
  * Semantics (bit-exact to the declarative form and the DuckDB
  * oracle): per subspace j, d(c) = (dot(v_j,v_j) − 2·dot(v_j,C[j][c]))
  * + Σ C[j][c]², sequential left-to-right sums, ties to the LOWEST
  * code (strict `<` scanning codes in ascending order).
  *
  * `books` is the [m][k][subDim] codebook flattened row-major;
  * `csq(j·k + c)` = Σ C[j][c]² is precomputed at construction exactly
  * as the declarative form's `lit(ctr.map(x => x*x).sum)`.
  */
case class PqEncode(child: Expression, subDim: Int, k: Int,
    books: Array[Double]) extends UnaryExpression {

  private val m: Int = books.length / (k * subDim)
  private lazy val csq: Array[Double] = {
    val out = new Array[Double](m * k)
    var jc = 0
    while (jc < m * k) {
      var s = 0.0
      var i = 0
      while (i < subDim) { val x = books(jc * subDim + i); s += x * x; i += 1 }
      out(jc) = s
      jc += 1
    }
    out
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val off = j * subDim
      var vv = 0.0
      var i = 0
      while (i < subDim) { val x = v.getDouble(off + i); vv += x * x; i += 1 }
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < k) {
        val b = (j * k + c) * subDim
        var vc = 0.0
        i = 0
        while (i < subDim) { vc += v.getDouble(off + i) * books(b + i); i += 1 }
        val d = (vv - 2.0 * vc) + csq(j * k + c)
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val booksRef = ctx.addReferenceObj("pqBooks", books, "double[]")
      val csqRef = ctx.addReferenceObj("pqCsq", csq, "double[]")
      val codes = ctx.freshName("codes")
      val j = ctx.freshName("j"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val off = ctx.freshName("off")
      val vv = ctx.freshName("vv"); val vc = ctx.freshName("vc")
      val d = ctx.freshName("d"); val b = ctx.freshName("b")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      s"""
         |int[] $codes = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $off = $j * $subDim;
         |  double $vv = 0.0;
         |  for (int $i = 0; $i < $subDim; $i++) {
         |    double __x = $v.getDouble($off + $i); $vv += __x * __x;
         |  }
         |  int $best = 0; double $bestD = Double.POSITIVE_INFINITY;
         |  for (int $c = 0; $c < $k; $c++) {
         |    int $b = ($j * $k + $c) * $subDim;
         |    double $vc = 0.0;
         |    for (int $i = 0; $i < $subDim; $i++) {
         |      $vc += $v.getDouble($off + $i) * $booksRef[$b + $i];
         |    }
         |    double $d = ($vv - 2.0 * $vc) + $csqRef[$j * $k + $c];
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  $codes[$j] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_pq_encode"
}

object PqEncode {
  /** Column entry point from a structured [m][k][subDim] codebook. */
  def encode(v: Column, subDim: Int, codebooks: Seq[Seq[Seq[Double]]]): Column = {
    val k = codebooks.head.length
    val flat = codebooks.flatten.flatten.toArray
    Bridge.column(PqEncode(
      Bridge.expression(v.cast("array<double>")), subDim, k, flat))
  }
}

/** Native ADC lookup-table builder: for a query vector, the m×k table
  * of raw subspace dot products dot(v_j, C[j][c]) as
  * `array<array<double>>`. Same janino rationale as [[PqEncode]] —
  * the declarative form unrolls m·k inline dots and breaks the 64 KB
  * method limit at m=16 (observed on the s17 probe projection). The
  * decimal per-term quantization the oracle mirrors is applied by the
  * caller (a nested `transform` over this table — per-query cost,
  * never per-candidate).
  */
case class PqLut(child: Expression, subDim: Int, k: Int,
    books: Array[Double]) extends UnaryExpression {

  private val m: Int = books.length / (k * subDim)

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val rows = new Array[Any](m)
    var j = 0
    while (j < m) {
      val off = j * subDim
      val terms = new Array[Double](k)
      var c = 0
      while (c < k) {
        val b = (j * k + c) * subDim
        var vc = 0.0
        var i = 0
        while (i < subDim) { vc += v.getDouble(off + i) * books(b + i); i += 1 }
        terms(c) = vc
        c += 1
      }
      rows(j) = new GenericArrayData(terms)
      j += 1
    }
    new GenericArrayData(rows)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val booksRef = ctx.addReferenceObj("pqBooks", books, "double[]")
      val rows = ctx.freshName("rows")
      val terms = ctx.freshName("terms")
      val j = ctx.freshName("j"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val off = ctx.freshName("off")
      val vc = ctx.freshName("vc"); val b = ctx.freshName("b")
      val gad = "org.apache.spark.sql.catalyst.util.GenericArrayData"
      s"""
         |Object[] $rows = new Object[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $off = $j * $subDim;
         |  double[] $terms = new double[$k];
         |  for (int $c = 0; $c < $k; $c++) {
         |    int $b = ($j * $k + $c) * $subDim;
         |    double $vc = 0.0;
         |    for (int $i = 0; $i < $subDim; $i++) {
         |      $vc += $v.getDouble($off + $i) * $booksRef[$b + $i];
         |    }
         |    $terms[$c] = $vc;
         |  }
         |  $rows[$j] = new $gad($terms);
         |}
         |${ev.value} = new $gad($rows);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_pq_lut"
}

object PqLut {
  /** Column entry point from a structured [m][k][subDim] codebook. */
  def lut(v: Column, subDim: Int, codebooks: Seq[Seq[Seq[Double]]]): Column = {
    val k = codebooks.head.length
    val flat = codebooks.flatten.flatten.toArray
    Bridge.column(PqLut(
      Bridge.expression(v.cast("array<double>")), subDim, k, flat))
  }
}
