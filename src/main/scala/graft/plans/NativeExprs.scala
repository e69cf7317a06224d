package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

import graft.functions.NativeHashOps

/** Native scalar expressions for the hashing/similarity hot paths.
  *
  * Spark's higher-order functions (transform/aggregate/zip_with) evaluate
  * interpreted — per-element object churn that cost ~80 ms/doc in the
  * round-2 bench (d3_simhash 39 s / 500 docs). These expressions implement
  * doGenCode, so they stay inside whole-stage codegen and dispatch one call
  * into the compiled [[NativeHashOps]] kernels per row.
  *
  * Registered as SQL functions (graft_*) per-session via
  * [[GraftFunctions.register]] or globally with
  * spark.sql.extensions=graft.plans.GraftExtensions.
  */
object NativeExprs {

  /** graft_simhash(array<string> tokens, int bits) -> bit string. */
  case class GraftSimHash(left: Expression, right: Expression)
    extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType.catalogString == ArrayType(StringType).catalogString && right.dataType.catalogString == IntegerType.catalogString)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, int), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    override def dataType: DataType = StringType
    override protected def nullSafeEval(tokens: Any, bits: Any): Any =
      NativeHashOps.simhash(tokens.asInstanceOf[ArrayData],
        bits.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (t, b) => s"graft.functions.NativeHashOps.simhash($t, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(newLeft, newRight)
    override def prettyName: String = "graft_simhash"
  }

  /** graft_minhash_sig(array<string> shingles, int k) -> array<bigint>. */
  case class GraftMinHashSig(left: Expression, right: Expression)
    extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType.catalogString == ArrayType(StringType).catalogString && right.dataType.catalogString == IntegerType.catalogString)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, int), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(shingles: Any, k: Any): Any =
      NativeHashOps.minhashSig(shingles.asInstanceOf[ArrayData],
        k.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (s, k) => s"graft.functions.NativeHashOps.minhashSig($s, $k)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(newLeft, newRight)
    override def prettyName: String = "graft_minhash_sig"
  }

  /** graft_word_shingles(array<string> words, int n) -> array<string>. */
  case class GraftWordShingles(left: Expression, right: Expression)
    extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType.catalogString == ArrayType(StringType).catalogString && right.dataType.catalogString == IntegerType.catalogString)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, int), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override protected def nullSafeEval(words: Any, n: Any): Any =
      NativeHashOps.wordShingles(words.asInstanceOf[ArrayData],
        n.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (w, n) => s"graft.functions.NativeHashOps.wordShingles($w, $n)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(newLeft, newRight)
    override def prettyName: String = "graft_word_shingles"
  }

  /** graft_md5_char_ngrams(string normalized, int n) -> array<string>
    * (distinct grams, first-occurrence order, md5-hex'd).
    */
  case class GraftMd5CharNgrams(left: Expression, right: Expression)
    extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType.catalogString == StringType.catalogString && right.dataType.catalogString == IntegerType.catalogString)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override protected def nullSafeEval(s: Any, n: Any): Any =
      NativeHashOps.md5CharNgrams(
        s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        n.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (s, n) => s"graft.functions.NativeHashOps.md5CharNgrams($s, $n)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(newLeft, newRight)
    override def prettyName: String = "graft_md5_char_ngrams"
  }

  /** graft_md5_buckets(array<string>, int) -> array<long>: hashing-trick
    * feature buckets — first-7-hex-chars-of-md5 mod dim per element,
    * fused (the t15/t35 bucket contract).
    */
  case class GraftMd5Buckets(left: Expression, right: Expression)
    extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType.catalogString == ArrayType(StringType).catalogString
        && right.dataType.catalogString == IntegerType.catalogString)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, int), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    override def dataType: DataType = ArrayType(LongType)
    override protected def nullSafeEval(arr: Any, dim: Any): Any =
      NativeHashOps.md5Buckets(arr.asInstanceOf[ArrayData],
        dim.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, d) => s"graft.functions.NativeHashOps.md5Buckets($a, $d)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(newLeft, newRight)
    override def prettyName: String = "graft_md5_buckets"
  }

  /** graft_md5_array(array<string>) -> array<string>: md5-hex each element. */
  case class GraftMd5Array(child: Expression)
    extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType.catalogString == ArrayType(StringType).catalogString)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got " +
          child.dataType.catalogString)
    override def dataType: DataType = ArrayType(StringType)
    override protected def nullSafeEval(arr: Any): Any =
      NativeHashOps.md5Array(arr.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        a => s"graft.functions.NativeHashOps.md5Array($a)")
    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(newChild)
    override def prettyName: String = "graft_md5_array"
  }

  /** graft_letter_entropy(string normalized) -> double: Shannon entropy
    * over the [a-z] distribution of an already-normalized (a-z-only)
    * string. One counting pass per row instead of 26 fused
    * length-difference probes — the inlined form grew a whole-stage
    * method past janino's 64 KB cap (t20 / Corpus -entropy band) and
    * fell back to interpreted execution. Bit-identical arithmetic:
    * a..z-ordered fold of (-p)*StrictMath.log(p), see
    * [[graft.functions.NativeHashOps.letterEntropy]].
    */
  case class GraftLetterEntropy(child: Expression)
    extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType.catalogString == StringType.catalogString)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got " + child.dataType.catalogString)
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(s: Any): Any =
      NativeHashOps.letterEntropy(
        s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        s => s"graft.functions.NativeHashOps.letterEntropy($s)")
    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(newChild)
    override def prettyName: String = "graft_letter_entropy"
  }

  /** graft_hamming(string, string) -> int. */
  case class GraftHamming(left: Expression, right: Expression)
    extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType.catalogString == StringType.catalogString && right.dataType.catalogString == StringType.catalogString)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    override def dataType: DataType = IntegerType
    override protected def nullSafeEval(a: Any, b: Any): Any =
      NativeHashOps.hamming(
        a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.NativeHashOps.hamming($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(newLeft, newRight)
    override def prettyName: String = "graft_hamming"
  }

  /** graft_translate_dna(string seq, int frame) -> string protein.
    * Codon-table lookup compiled into [[graft.functions.NativeSeqOps]];
    * replaces the 64-entry map-literal scan per codon.
    */
  case class GraftTranslateDna(left: Expression, right: Expression)
    extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType.catalogString == StringType.catalogString && right.dataType.catalogString == IntegerType.catalogString)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    override def dataType: DataType = StringType
    override protected def nullSafeEval(seq: Any, frame: Any): Any =
      graft.functions.NativeSeqOps.translateDna(
        seq.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        frame.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (s, f) => s"graft.functions.NativeSeqOps.translateDna($s, $f)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(newLeft, newRight)
    override def prettyName: String = "graft_translate_dna"
  }

  /** graft_cosine(array<double>, array<double>) -> double, left-fold sums
    * matching vectors.cosine / the DuckDB list_reduce oracles exactly.
    */
  case class GraftCosine(left: Expression, right: Expression)
    extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType.catalogString == ArrayType(DoubleType).catalogString && right.dataType.catalogString == ArrayType(DoubleType).catalogString)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<double>), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(a: Any, b: Any): Any =
      NativeHashOps.cosine(a.asInstanceOf[ArrayData],
        b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.NativeHashOps.cosine($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(newLeft, newRight)
    override def prettyName: String = "graft_cosine"
  }

  /** graft_dot(array<double>, array<double>) -> double, left-fold inner
    * product matching the DuckDB list_reduce oracle exactly.
    */
  case class GraftDot(left: Expression, right: Expression)
    extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType.catalogString == ArrayType(DoubleType).catalogString && right.dataType.catalogString == ArrayType(DoubleType).catalogString)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<double>), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(a: Any, b: Any): Any =
      NativeHashOps.dot(a.asInstanceOf[ArrayData],
        b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.NativeHashOps.dot($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(newLeft, newRight)
    override def prettyName: String = "graft_dot"
  }

  /** graft_winnow_fps(array<string> words, int k, int window) ->
    * array<bigint>: the fused winnowing front end — word k-grams, 60-bit
    * md5-prefix hashes, O(n) deque window minima, distinct. One compiled
    * call per row instead of an interpreted O(n*window) slice fold.
    */
  case class GraftWinnowFps(first: Expression, second: Expression,
                            third: Expression) extends TernaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (first.dataType.catalogString ==
          ArrayType(StringType).catalogString &&
        second.dataType.catalogString == IntegerType.catalogString &&
        third.dataType.catalogString == IntegerType.catalogString)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, int, int), got " +
          s"(${first.dataType.catalogString}, " +
          s"${second.dataType.catalogString}, " +
          s"${third.dataType.catalogString})")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(w: Any, k: Any, win: Any): Any =
      NativeHashOps.winnowFps(w.asInstanceOf[ArrayData],
        k.asInstanceOf[Int], win.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (w, k, win) => s"graft.functions.NativeHashOps.winnowFps($w, $k, $win)")
    override protected def withNewChildrenInternal(
        f: Expression, sc: Expression, t: Expression): Expression =
      copy(f, sc, t)
    override def prettyName: String = "graft_winnow_fps"
  }
}

/** Session registration for the graft_* scalar functions. */


object GraftFunctions {
  import NativeExprs._

  private def arity2(name: String,
                     f: (Expression, Expression) => Expression)
    : Seq[Expression] => Expression = { children =>
    require(children.length == 2, s"$name takes 2 arguments")
    f(children(0), children(1))
  }

  val all: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("graft_simhash", classOf[GraftSimHash],
      arity2("graft_simhash", GraftSimHash.apply)),
    ("graft_minhash_sig", classOf[GraftMinHashSig],
      arity2("graft_minhash_sig", GraftMinHashSig.apply)),
    ("graft_word_shingles", classOf[GraftWordShingles],
      arity2("graft_word_shingles", GraftWordShingles.apply)),
    ("graft_md5_char_ngrams", classOf[GraftMd5CharNgrams],
      arity2("graft_md5_char_ngrams", GraftMd5CharNgrams.apply)),
    ("graft_md5_buckets", classOf[GraftMd5Buckets],
      arity2("graft_md5_buckets", GraftMd5Buckets.apply)),
    ("graft_md5_array", classOf[GraftMd5Array],
      { children: Seq[Expression] =>
        require(children.length == 1, "graft_md5_array takes 1 argument")
        GraftMd5Array(children.head)
      }),
    ("graft_hamming", classOf[GraftHamming],
      arity2("graft_hamming", GraftHamming.apply)),
    ("graft_letter_entropy", classOf[GraftLetterEntropy],
      { children: Seq[Expression] =>
        require(children.length == 1,
          "graft_letter_entropy takes 1 argument")
        GraftLetterEntropy(children.head)
      }),
    ("graft_cosine", classOf[GraftCosine],
      arity2("graft_cosine", GraftCosine.apply)),
    ("graft_dot", classOf[GraftDot],
      arity2("graft_dot", GraftDot.apply)),
    ("graft_translate_dna", classOf[GraftTranslateDna],
      arity2("graft_translate_dna", GraftTranslateDna.apply)),
    ("graft_img_decode", classOf[MediaExprs.GraftImgDecode],
      { children: Seq[Expression] =>
        require(children.length == 1, "graft_img_decode takes 1 argument")
        MediaExprs.GraftImgDecode(children.head)
      }),
    ("graft_img_resize", classOf[MediaExprs.GraftImgResize],
      arity2("graft_img_resize", MediaExprs.GraftImgResize.apply)),
    ("graft_img_grid", classOf[MediaExprs.GraftImgGrid],
      { children: Seq[Expression] =>
        require(children.length == 3, "graft_img_grid takes 3 arguments")
        MediaExprs.GraftImgGrid(children(0), children(1), children(2))
      }),
    ("graft_wav_meta", classOf[MediaExprs.GraftWavMeta],
      { children: Seq[Expression] =>
        require(children.length == 1, "graft_wav_meta takes 1 argument")
        MediaExprs.GraftWavMeta(children.head)
      }),
    ("graft_winnow_fps", classOf[GraftWinnowFps],
      { children: Seq[Expression] =>
        require(children.length == 3, "graft_winnow_fps takes 3 arguments")
        GraftWinnowFps(children(0), children(1), children(2))
      }),
    ("graft_wav_frames", classOf[MediaExprs.GraftWavFrames],
      arity2("graft_wav_frames", MediaExprs.GraftWavFrames.apply)),
    ("graft_mp4_meta", classOf[MediaExprs.GraftMp4Meta],
      { children: Seq[Expression] =>
        require(children.length == 1, "graft_mp4_meta takes 1 argument")
        MediaExprs.GraftMp4Meta(children.head)
      }),
    ("graft_jpeg_meta", classOf[MediaExprs.GraftJpegMeta],
      { children: Seq[Expression] =>
        require(children.length == 1, "graft_jpeg_meta takes 1 argument")
        MediaExprs.GraftJpegMeta(children.head)
      }),
    ("graft_exif_meta", classOf[MediaExprs.GraftExifMeta],
      { children: Seq[Expression] =>
        require(children.length == 1, "graft_exif_meta takes 1 argument")
        MediaExprs.GraftExifMeta(children.head)
      }),
    ("graft_id3_meta", classOf[MediaExprs.GraftId3Meta],
      { children: Seq[Expression] =>
        require(children.length == 1, "graft_id3_meta takes 1 argument")
        MediaExprs.GraftId3Meta(children.head)
      }),
    ("graft_deflate_len", classOf[MediaExprs.GraftDeflateLen],
      { children: Seq[Expression] =>
        require(children.length == 1,
          "graft_deflate_len takes 1 argument")
        MediaExprs.GraftDeflateLen(children.head)
      })
  )

  /** Idempotent per-session registration (operators call this; the
    * spark.sql.extensions path goes through [[GraftExtensions]]).
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    all.foreach { case (name, cls, builder) =>
      val ident = FunctionIdentifier(name)
      if (!registry.functionExists(ident)) {
        registry.registerFunction(ident,
          new ExpressionInfo(cls.getName, name), builder)
      }
    }
  }
}
