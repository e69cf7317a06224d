package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{Block, CodegenContext, CodeGenerator, EmptyBlock, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.NativeProteinOps

/** Catalyst wrappers for the [[NativeProteinOps]] kernels — the protein
  * pipeline's per-row folds as single compiled calls that stay inside
  * whole-stage codegen (the [[NativeExprs]] pattern, N-ary).
  *
  * All kernels assume non-null inputs (the pipeline constructs every
  * child with when/otherwise defaults); a null child nulls the whole
  * result, matching nullSafeEval semantics.
  */
object ProteinExprs {

  /** N-ary base: evaluate children, null out on any null child, one
    * static call into the compiled kernel per row — both interpreted
    * (`eval`) and codegen paths dispatch the same JVM method.
    */
  private[plans] abstract class KernelExpr extends Expression {
    override def nullable: Boolean = true
    /** Fully-qualified static method the codegen path calls. */
    protected def staticFn: String
    /** Plan-time literal flags appended after the child values. */
    protected def extraArgs: Seq[String] = Nil
    protected def evalKernel(args: Array[Any]): Any

    final override def eval(input: InternalRow): Any = {
      val cs = children
      val args = new Array[Any](cs.length)
      var i = 0
      while (i < cs.length) {
        val v = cs(i).eval(input)
        if (v == null) return null
        args(i) = v
        i += 1
      }
      evalKernel(args)
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode = {
      val gens = children.map(_.genCode(ctx))
      val javaT = CodeGenerator.javaType(dataType)
      val callArgs = (gens.map(_.value.toString) ++ extraArgs)
        .mkString(", ")
      val anyNull = gens.map(_.isNull.toString).mkString(" || ")
      val childCode = gens.map(_.code).foldLeft(EmptyBlock: Block)(_ + _)
      ev.copy(code =
        code"""
          $childCode
          boolean ${ev.isNull} = $anyNull;
          $javaT ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
          if (!${ev.isNull}) {
            ${ev.value} = ($javaT) $staticFn($callArgs);
          }""")
    }

    protected def expect(pairs: (DataType, String)*): TypeCheckResult = {
      val bad = children.zip(pairs).zipWithIndex.collectFirst {
        case ((c, (t, what)), i)
          if c.dataType.catalogString != t.catalogString =>
          s"$prettyName argument $i ($what) wants ${t.catalogString}, " +
            s"got ${c.dataType.catalogString}"
      }
      bad.map(TypeCheckResult.TypeCheckFailure)
        .getOrElse(TypeCheckResult.TypeCheckSuccess)
    }
  }

  private val ExonsType =
    ArrayType(StructType(Seq(
      StructField("start", LongType), StructField("end", LongType))))

  private val FrameArrayType =
    ArrayType(StructType(Seq(
      StructField("ploc", LongType),
      StructField("aa", StringType))), containsNull = false)

  /** graft_rna_allele(exons, dnaLoc, ref, alt) ->
    * struct<rna:long, ref:string, alt:string, intersect:int>.
    */
  case class GraftRnaAllele(exons: Expression, loc: Expression,
                            ref: Expression, alt: Expression)
    extends KernelExpr {
    override def children: Seq[Expression] = Seq(exons, loc, ref, alt)
    override def checkInputDataTypes(): TypeCheckResult =
      expect((ExonsType, "exons"), (LongType, "dnaLoc"),
        (StringType, "ref"), (StringType, "alt"))
    override def dataType: DataType = StructType(Seq(
      StructField("rna", LongType),
      StructField("ref", StringType),
      StructField("alt", StringType),
      StructField("intersect", IntegerType)))
    override protected def staticFn: String =
      "graft.functions.NativeProteinOps.rnaAllele"
    override protected def evalKernel(a: Array[Any]): Any =
      NativeProteinOps.rnaAllele(a(0).asInstanceOf[ArrayData],
        a(1).asInstanceOf[Long], a(2).asInstanceOf[UTF8String],
        a(3).asInstanceOf[UTF8String])
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression =
      copy(c(0), c(1), c(2), c(3))
    override def prettyName: String = "graft_rna_allele"
  }

  /** graft_affected(cdna, loc, alen, rf, pstart) ->
    * array<struct<ploc:long, aa:string>> (1 entry, or 3 when rf = -1).
    */
  case class GraftAffected(cdna: Expression, loc: Expression,
                           alen: Expression, rf: Expression,
                           pstart: Expression) extends KernelExpr {
    override def children: Seq[Expression] =
      Seq(cdna, loc, alen, rf, pstart)
    override def checkInputDataTypes(): TypeCheckResult =
      expect((StringType, "cdna"), (LongType, "loc"), (LongType, "alen"),
        (LongType, "rf"), (LongType, "pstart"))
    override def dataType: DataType = FrameArrayType
    override protected def staticFn: String =
      "graft.functions.NativeProteinOps.affected"
    override protected def evalKernel(a: Array[Any]): Any =
      NativeProteinOps.affected(a(0).asInstanceOf[UTF8String],
        a(1).asInstanceOf[Long], a(2).asInstanceOf[Long],
        a(3).asInstanceOf[Long], a(4).asInstanceOf[Long])
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression =
      copy(c(0), c(1), c(2), c(3), c(4))
    override def prettyName: String = "graft_affected"
  }

  /** graft_start_state(vars, sl0, rf0, ps0, hasStart; forceRf,
    * skipStartLoss) -> struct<sl:long, rf:int, ps:long, lost:boolean,
    * invalid:boolean, lostOrd:long>.
    */
  case class GraftStartState(vars: Expression, sl0: Expression,
                             rf0: Expression, ps0: Expression,
                             hasStart: Expression, forceRf: Boolean,
                             skipStartLoss: Boolean) extends KernelExpr {
    override def children: Seq[Expression] =
      Seq(vars, sl0, rf0, ps0, hasStart)
    override def checkInputDataTypes(): TypeCheckResult =
      if (!vars.dataType.isInstanceOf[ArrayType])
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName wants an array of variant structs, got " +
            vars.dataType.catalogString)
      else expect((vars.dataType, "vars"), (LongType, "sl0"),
        (IntegerType, "rf0"), (LongType, "ps0"), (BooleanType, "hasStart"))
    override def dataType: DataType = StructType(Seq(
      StructField("sl", LongType),
      StructField("rf", IntegerType),
      StructField("ps", LongType),
      StructField("lost", BooleanType),
      StructField("invalid", BooleanType),
      StructField("lostOrd", LongType)))
    override protected def staticFn: String =
      "graft.functions.NativeProteinOps.startState"
    override protected def extraArgs: Seq[String] =
      Seq(forceRf.toString, skipStartLoss.toString)
    override protected def evalKernel(a: Array[Any]): Any =
      NativeProteinOps.startState(a(0).asInstanceOf[ArrayData],
        a(1).asInstanceOf[Long], a(2).asInstanceOf[Int],
        a(3).asInstanceOf[Long], a(4).asInstanceOf[Boolean],
        forceRf, skipStartLoss)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression =
      copy(c(0), c(1), c(2), c(3), c(4))
    override def prettyName: String = "graft_start_state"
  }

  /** graft_apply_vars(vars, cdna) -> struct<s:string, ok:boolean>. */
  case class GraftApplyVars(vars: Expression, cdna: Expression)
    extends KernelExpr {
    override def children: Seq[Expression] = Seq(vars, cdna)
    override def checkInputDataTypes(): TypeCheckResult =
      if (!vars.dataType.isInstanceOf[ArrayType])
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName wants an array of variant structs, got " +
            vars.dataType.catalogString)
      else expect((vars.dataType, "vars"), (StringType, "cdna"))
    override def dataType: DataType = StructType(Seq(
      StructField("s", StringType),
      StructField("ok", BooleanType)))
    override protected def staticFn: String =
      "graft.functions.NativeProteinOps.applyVars"
    override protected def evalKernel(a: Array[Any]): Any =
      NativeProteinOps.applyVars(a(0).asInstanceOf[ArrayData],
        a(1).asInstanceOf[UTF8String])
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression = copy(c(0), c(1))
    override def prettyName: String = "graft_apply_vars"
  }

  /** graft_conseq(refA, altA, dnaType, isFs, hasFsBefore) ->
    * struct<conseq:string, protch:string, syn:boolean> — the per-frame
    * consequence/change strings '|'-joined plus the all-frames
    * synonymous flag.
    */
  case class GraftConseq(refA: Expression, altA: Expression,
                         dnaType: Expression, isFs: Expression,
                         hasFsBefore: Expression) extends KernelExpr {
    override def children: Seq[Expression] =
      Seq(refA, altA, dnaType, isFs, hasFsBefore)
    override def checkInputDataTypes(): TypeCheckResult =
      expect((FrameArrayType, "refA"), (FrameArrayType, "altA"),
        (StringType, "dnaType"), (BooleanType, "isFs"),
        (BooleanType, "hasFsBefore"))
    override def dataType: DataType = StructType(Seq(
      StructField("conseq", StringType),
      StructField("protch", StringType),
      StructField("syn", BooleanType)))
    override protected def staticFn: String =
      "graft.functions.NativeProteinOps.conseq"
    override protected def evalKernel(a: Array[Any]): Any =
      NativeProteinOps.conseq(a(0).asInstanceOf[ArrayData],
        a(1).asInstanceOf[ArrayData], a(2).asInstanceOf[UTF8String],
        a(3).asInstanceOf[Boolean], a(4).asInstanceOf[Boolean])
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression =
      copy(c(0), c(1), c(2), c(3), c(4))
    override def prettyName: String = "graft_conseq"
  }

  // ---- Column builders (no registry round trip — the dna.translateDna
  // pattern via GraftColumnBridge) -----------------------------------------
  import org.apache.spark.sql.classic.GraftColumnBridge.{column => col_, expression => ex}

  def rnaAllele(exons: Column, loc: Column, ref: Column,
                alt: Column): Column =
    col_(GraftRnaAllele(ex(exons), ex(loc), ex(ref), ex(alt)))

  def affected(cdna: Column, loc: Column, alen: Column, rf: Column,
               pstart: Column): Column =
    col_(GraftAffected(ex(cdna), ex(loc), ex(alen), ex(rf), ex(pstart)))

  def startState(vars: Column, sl0: Column, rf0: Column, ps0: Column,
                 hasStart: Column, forceRf: Boolean,
                 skipStartLoss: Boolean): Column =
    col_(GraftStartState(ex(vars), ex(sl0), ex(rf0), ex(ps0),
      ex(hasStart), forceRf, skipStartLoss))

  def applyVars(vars: Column, cdna: Column): Column =
    col_(GraftApplyVars(ex(vars), ex(cdna)))

  def conseq(refA: Column, altA: Column, dnaType: Column, isFs: Column,
             hasFsBefore: Column): Column =
    col_(GraftConseq(ex(refA), ex(altA), ex(dnaType), ex(isFs),
      ex(hasFsBefore)))
}
