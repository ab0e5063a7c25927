package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.HtmlBlocks

/** F23 as a NATIVE Catalyst expression (the preference order for custom
  * scalar work: builtin composition > native `Expression` with
  * `doGenCode` > UDF). Compared to the `udf(...)` form this stays
  * inside WholeStageCodegen — no UDF invocation plumbing, no
  * Row⇄Scala conversion, null handling generated inline — while
  * evaluating the same linear-time converter.
  *
  * Registered as SQL function `graft_html_to_blocks` either via
  * `spark.sql.extensions=graft.plans.GraftExtensions` (cluster config)
  * or [[GraftExtensions.register]] on a live session.
  */
case class HtmlToBlocksExpression(child: Expression)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_html_to_blocks"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_html_to_blocks requires STRING, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(HtmlBlocks.convert(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.HtmlBlocks.convert($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): HtmlToBlocksExpression =
    copy(child = newChild)
}

/** Session-extension entry point: `--conf
  * spark.sql.extensions=graft.plans.GraftExtensions` injects the
  * function at session build; [[register]] adds it to an existing
  * session's registry (tests, notebooks). */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  private def unary(name: String, cls: Class[_],
                    build: Expression => Expression):
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo(cls.getName, name),
    (children: Seq[Expression]) => {
      require(children.size == 1, s"$name takes exactly one argument")
      build(children.head)
    })

  private[plans] val functions = Seq(
    unary("graft_html_to_blocks", classOf[HtmlToBlocksExpression], HtmlToBlocksExpression(_)),
    unary("graft_slugify", classOf[SlugifyExpression], SlugifyExpression(_)),
    unary("graft_html_extract", classOf[HtmlExtractExpression], HtmlExtractExpression(_)),
    unary("graft_repetition_stats", classOf[RepetitionStatsExpression],
      RepetitionStatsExpression(_)),
    (FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSignatureExpression].getName, "graft_minhash_sig"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_minhash_sig takes (array<bigint>, k)")
        val k = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_minhash_sig: k must be an integer literal, got $other")
        }
        MinHashSignatureExpression(children.head, k)
      }),
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductExpression].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_dot takes exactly two arguments")
        DotProductExpression(children(0), children(1))
      }),
    (FunctionIdentifier("graft_sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSizeExpression].getName,
        "graft_sorted_intersect_size"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_sorted_intersect_size takes exactly two arguments")
        SortedIntersectSizeExpression(children(0), children(1))
      }),
    (FunctionIdentifier("graft_greedy_pack"),
      new ExpressionInfo(classOf[GreedyPackExpression].getName, "graft_greedy_pack"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_greedy_pack takes (array<bigint>, budget)")
        val b = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
          case other => throw new IllegalArgumentException(
            s"graft_greedy_pack: budget must be an integer literal, got $other")
        }
        GreedyPackExpression(children.head, b)
      }),
    unary("graft_semantic_chain", classOf[SemanticChainExpression],
      SemanticChainExpression(_)),
    unary("graft_simhash64", classOf[SimHash64Expression], SimHash64Expression(_)),
    unary("graft_nfc", classOf[NfcNormalizeExpression], NfcNormalizeExpression(_)),
    unary("graft_deflate_len", classOf[DeflateLenExpression], DeflateLenExpression(_)),
    bpe("graft_bpe_encode", countOnly = false),
    bpe("graft_bpe_count", countOnly = true),
    unigram("graft_unigram_encode", countOnly = false),
    unigram("graft_unigram_count", countOnly = true),
    (FunctionIdentifier("graft_interpolate"),
      new ExpressionInfo(classOf[InterpolateExpression].getName, "graft_interpolate"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_interpolate takes (str, map)")
        InterpolateExpression(children(0), children(1))
      }),
    (FunctionIdentifier("graft_winnow_fps"),
      new ExpressionInfo(classOf[WinnowFpExpression].getName, "graft_winnow_fps"),
      (children: Seq[Expression]) => {
        require(children.size == 4, "graft_winnow_fps takes (text, k, w, salt)")
        def intLit(e: Expression, what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_winnow_fps: $what must be an int literal, got $other")
        }
        val saltV = children(3) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: UTF8String, StringType) =>
            v.toString
          case other => throw new IllegalArgumentException(
            s"graft_winnow_fps: salt must be a string literal, got $other")
        }
        WinnowFpExpression(children.head, intLit(children(1), "k"),
          intLit(children(2), "w"), saltV)
      }),
    (FunctionIdentifier("graft_gram_hashes"),
      new ExpressionInfo(classOf[GramHashExpression].getName, "graft_gram_hashes"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "graft_gram_hashes takes (text, k, seed)")
        val k = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_gram_hashes: k must be an int literal, got $other")
        }
        val seed = children(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
          case other => throw new IllegalArgumentException(
            s"graft_gram_hashes: seed must be a long literal, got $other")
        }
        GramHashExpression(children.head, k, seed)
      }),
    (FunctionIdentifier("graft_registrable_domain"),
      new ExpressionInfo(classOf[RegistrableDomainExpression].getName,
        "graft_registrable_domain"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_registrable_domain takes (host, rules)")
        val rules = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: UTF8String, StringType) =>
            v.toString
          case other => throw new IllegalArgumentException(
            s"graft_registrable_domain: rules must be a string literal, got $other")
        }
        RegistrableDomainExpression(children.head, rules)
      }),
    (FunctionIdentifier("graft_adc"),
      new ExpressionInfo(classOf[PqAdcExpression].getName, "graft_adc"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "graft_adc takes (qv, codes, model)")
        val model = children(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: UTF8String, StringType) =>
            v.toString
          case other => throw new IllegalArgumentException(
            s"graft_adc: model must be a string literal, got $other")
        }
        PqAdcExpression(children(0), children(1), model)
      }),
    (FunctionIdentifier("graft_pq_encode"),
      new ExpressionInfo(classOf[PqEncodeExpression].getName, "graft_pq_encode"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_pq_encode takes (vec, model)")
        val model = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: UTF8String, StringType) =>
            v.toString
          case other => throw new IllegalArgumentException(
            s"graft_pq_encode: model must be a string literal, got $other")
        }
        PqEncodeExpression(children.head, model)
      }),
    (FunctionIdentifier("graft_clf_score"),
      new ExpressionInfo(classOf[ClassifierScoreExpression].getName, "graft_clf_score"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "graft_clf_score takes (text, weights, salt)")
        def strLit(e: Expression, what: String): String = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: UTF8String, StringType) =>
            v.toString
          case other => throw new IllegalArgumentException(
            s"graft_clf_score: $what must be a string literal, got $other")
        }
        ClassifierScoreExpression(children.head,
          strLit(children(1), "weights"), strLit(children(2), "salt"))
      }))

  private def unigram(name: String, countOnly: Boolean):
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo(classOf[UnigramEncodeExpression].getName, name),
    (children: Seq[Expression]) => {
      require(children.size == 2, s"$name takes (text, pieces)")
      val pieces = children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: UTF8String, StringType) =>
          v.toString
        case other => throw new IllegalArgumentException(
          s"$name: pieces must be a string literal, got $other")
      }
      UnigramEncodeExpression(children.head, pieces, countOnly)
    })

  private def bpe(name: String, countOnly: Boolean):
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo(classOf[BpeEncodeExpression].getName, name),
    (children: Seq[Expression]) => {
      require(children.size == 2, s"$name takes (text, ladder)")
      val ladder = children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: UTF8String, StringType) =>
          v.toString
        case other => throw new IllegalArgumentException(
          s"$name: ladder must be a string literal, got $other")
      }
      BpeEncodeExpression(children.head, ladder, countOnly)
    })

  /** Register on a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
