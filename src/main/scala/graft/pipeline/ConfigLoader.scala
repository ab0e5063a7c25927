package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

import graft.columns.ColumnNs
import graft.functions.Fns
import graft.sinks.Sinks
import graft.sources.Sources

/** Config-driven migrations — the reference's YAML job files
  * (`README.md:35-94`, `GlobalConfig.php:90-107`) re-expressed as JSON
  * (the container ships no YAML parser; Jackson comes with Spark).
  *
  * Shape:
  * {{{
  * { "jobs": [ {
  *     "name": "wp_posts", "dependsOn": [], "skip": false,
  *     "extract":  [ {"kind":"csv","path":"in.csv","prefix":"legacy."} ],
  *     "transform":[ {"kind":"post_pipeline",
  *                    "options":{"titleCol":"legacy.title","contentCol":"legacy.content"}},
  *                   {"kind":"string_to_null","options":{"value":"N/A"}} ],
  *     "load":     [ {"kind":"json","path":"out.json","prefixes":["post."],"strip":"true"},
  *                   {"kind":"ledger","dir":"out","name":"wp_posts"} ] } ] }
  * }}}
  *
  * Kinds are resolved from open registries so plugins can add their own
  * (the reference's `pipeline: FQCN` reflective extension point,
  * `Transform/Orchestrator.php:103-117`).
  */
object ConfigLoader {

  type Options = Map[String, String]

  /** One-shot latch for the url_filter bundled-PSL semantics note —
    * driver-side, printed at most once per JVM. */
  private val pslDefaultNoted =
    new java.util.concurrent.atomic.AtomicBoolean(false)

  final case class StepConfig(kind: String, options: Options)

  /** extract kind -> (options => SourceSpec). */
  val sourceKinds: collection.mutable.Map[String, Options => Pipeline.SourceSpec] =
    collection.mutable.Map(
      "csv" -> (o => Pipeline.SourceSpec(
        s => Sources.readCsv(s, req(o, "path"),
          header = o.getOrElse("header", "true").toBoolean,
          delimiter = o.getOrElse("delimiter", ",")),
        prefix(o))),
      "json" -> (o => Pipeline.SourceSpec(
        s => Sources.readJson(s, req(o, "path"),
          multiLine = o.getOrElse("multiLine", "true").toBoolean),
        prefix(o))),
      "xml" -> (o => Pipeline.SourceSpec(
        s => Sources.readXml(s, req(o, "path"),
          nodePath = o.getOrElse("nodePath", "rss/channel/item")),
        prefix(o))),
      "rss" -> (o => Pipeline.SourceSpec(
        s => Sources.readRss(s, req(o, "url"), o.getOrElse("cacheDir", "output/.cache/rss"),
          nodePath = o.getOrElse("nodePath", "rss/channel/item")),
        prefix(o))),
      "parquet" -> (o => Pipeline.SourceSpec(
        s => s.read.parquet(req(o, "path")), prefix(o))),
      // Common Crawl WET segments (the web-corpus ingestion format):
      // splittable record-marker framing, conversion records only
      "warc_wet" -> (o => Pipeline.SourceSpec(
        s => Sources.readWarcWet(s, req(o, "path")), prefix(o))),
      // raw crawler archives (WARC response records): HTTP status +
      // media-type columns surface for gating; `status`/`contentType`
      // options apply the standard crawl gate at the source (drop
      // redirects/errors/non-HTML before any downstream stage runs)
      "warc_responses" -> (o => Pipeline.SourceSpec(
        s => {
          var df = Sources.readWarcResponses(s, req(o, "path"))
          o.get("status").foreach(v => df = df.where(col("http_status") === v.toInt))
          o.get("contentType").foreach(v => df = df.where(col("content_type") === v))
          df
        }, prefix(o))),
      "ledger" -> (o => Pipeline.SourceSpec(
        s => Sources.ledgerLatest(s, req(o, "dir"), req(o, "name")),
        prefix(o))))

  /** transform kind -> (options => Stage). */
  val transformKinds: collection.mutable.Map[String, Options => Pipeline.Stage] =
    collection.mutable.Map(
      "post_pipeline" -> (o => WpPipelines.postPipeline(WpPipelines.PostPipelineOpts(
        titleCol = o.getOrElse("titleCol", "legacy.title"),
        contentCol = o.getOrElse("contentCol", "legacy.content"),
        dateCol = o.get("dateCol"),
        postType = o.getOrElse("postType", "post"),
        postStatus = o.getOrElse("postStatus", "publish"),
        slugPrefix = o.getOrElse("slugPrefix", ""),
        convertBlocks = o.getOrElse("convertBlocks", "false").toBoolean))),
      "term_pipeline" -> (o => WpPipelines.termPipeline(
        req(o, "nameCol"), req(o, "taxonomy"), o.get("parentSlugCol"))),
      "user_pipeline" -> (o => WpPipelines.userPipeline(
        req(o, "loginCol"), req(o, "emailCol"))),
      "media_pipeline" -> (o => WpPipelines.mediaPipeline(
        req(o, "urlCol"), o.get("titleCol"))),
      "string_to_null" -> (o => df => Fns.stringToNull(df, req(o, "value"))),
      "rename_regex" -> (o => df =>
        ColumnNs.renameRegex(df, req(o, "pattern"), o.getOrElse("replacement", ""))),
      "select_prefix" -> (o => df =>
        ColumnNs.selectPrefix(df, req(o, "prefixes").split(",").toSeq,
          o.getOrElse("strip", "false").toBoolean)),
      "with_uid" -> (o => df =>
        df.withColumn(o.getOrElse("column", "etl.uid"), Fns.uuidV4)),
      "limit" -> (o => df => df.limit(req(o, "n").toInt)),
      // drop columns the downstream stages no longer need — the
      // column-pruning step a raw-crawl funnel takes right after
      // extraction: the raw html is ~the whole corpus by bytes, and
      // carrying it through dedup/pack checkpoints and shuffles
      // multiplies every materialization by the page size. Absent
      // columns are ignored (DataFrame.drop semantics) so one config
      // serves sources with and without optional metadata.
      "drop" -> (o => df =>
        df.drop(req(o, "columns").split(",").map(_.trim)
          .filter(_.nonEmpty): _*)),
      // LLM-pipeline transforms as config steps
      "dedup_exact" -> (o => df =>
        graft.llm.Dedup.exactDedup(df, req(o, "idCol"), req(o, "textCol"))),
      // SOFT dedup (DCLM-style downweight-instead-of-drop): default
      // samples each copy at rate 1/dup_count (each content group
      // survives with ~one expected copy, no positional keep-first
      // bias); sample: false annotates dup_count/weight and keeps
      // every row — the weights feed a downstream weightedSample /
      // mix stage instead
      "dedup_soft" -> (o => df => {
        val soft = graft.llm.Dedup.softDedupWeights(df,
          req(o, "idCol"), req(o, "textCol"))
        if (o.getOrElse("sample", "true").toBoolean)
          graft.llm.Mixing.weightedSample(soft, req(o, "idCol"),
              col("weight"), o.getOrElse("salt", "graft"))
            .drop("dup_count", "weight")
        else soft
      }),
      // MinHash near-dedup as a pipeline stage: banded candidate pairs
      // verified by true shingle Jaccard >= threshold, transitive
      // clusters labeled by min id, and only the canonical survivor of
      // each cluster kept (unpaired rows pass through). The anti-join's
      // right side is the LOSER set — proportional to near-dups found,
      // not the corpus
      "dedup_minhash" -> (o => df => {
        val idc = req(o, "idCol")
        // the cluster-resolution machinery labels components by LONG
        // id; a string id would cast to null inside a task and die
        // with an opaque NPE — reject NON-NUMERIC ids here with a
        // usable message (numeric widths/decimals cast losslessly for
        // integral values, the pre-existing behavior)
        df.schema(idc).dataType match {
          case _: org.apache.spark.sql.types.NumericType => ()
          case other => throw new Pipeline.ValidationException(
            s"config: dedup_minhash requires a numeric idCol (cluster " +
              s"labels are numeric); '$idc' is ${other.catalogString} — " +
              "derive a numeric id first (e.g. the regexp_extract kind " +
              "with castTo: long), or use dedup_exact, which accepts any id")
        }
        // the stage is inherently multi-pass (shingle/signature pass,
        // cluster resolution, then the anti-join's LEFT side, then
        // whatever the downstream stages run) — materialize the input
        // ONCE so a lazy upstream chain (e.g. the WARC crawl funnel
        // this kind sits inside) is not re-executed per pass. This is
        // the stage-boundary write real curation pipelines do here;
        // measured 8.8 -> ~4 s on the composed curate_to_shards chain
        // at sf0.1
        val input = df.localCheckpoint()
        val pairs = graft.llm.Dedup.minhashNearDups(input, idc,
          req(o, "textCol"),
          threshold = o.getOrElse("threshold", "0.7").toDouble,
          k = o.getOrElse("numHashes", "64").toInt,
          bands = o.getOrElse("bands", "16").toInt,
          maxBucket = o.getOrElse("maxBucket", "1000").toInt)
        // assertGapFloor (opt-in, OFF by default): raise loudly when a
        // DETECTED pair's exact Jaccard lands in [threshold, gapFloor).
        // Scope this correctly: a detected zone pair is handled
        // identically by the banded stage and an exact oracle — it
        // does NOT break equality (equality breaks only on MISSED
        // ≥-threshold pairs, which are unobservable in-query by
        // construction; ShardsChainGapSpec audits that directly with
        // an exact all-pairs pass). Use this option as a DRIFT
        // TRIPWIRE on corpora where "no near-threshold pairs" is a
        // maintained invariant — a zone pair appearing at all then
        // signals the corpus has drifted toward the regime where
        // banding's per-pair miss probability ((1−t^r)^b) starts to
        // matter. The graft test corpus is NOT such a corpus: sf0.1
        // carries an organic pair at j = 0.7733 (measured round 13),
        // so the shards funnel does not set this option.
        val guarded = o.get("assertGapFloor").map(_.toDouble) match {
          case Some(gf) => pairs.where(
            when(col("jaccard") < gf, raise_error(concat(
              lit("dedup_minhash: pair in the banded/exact equivalence " +
                s"gap [threshold, $gf): a="), col("a").cast("string"),
              lit(" b="), col("b").cast("string"),
              lit(" jaccard="), col("jaccard").cast("string")))
              .cast("boolean")).otherwise(lit(true)))
          case None => pairs
        }
        val losers = graft.llm.Dedup.nearDupClusters(guarded)
          .where(col("doc_id") =!= col("cluster_id"))
          .select(col("doc_id").as("__graft_loser"))
        input.join(losers, ColumnNs.q(idc) === col("__graft_loser"),
          "left_anti")
      }),
      // generic column derivation by regex (e.g. recover a numeric doc
      // id from a crawl URL): column + pattern + group -> outCol,
      // optionally cast (castTo: long/int/double/...)
      "regexp_extract" -> (o => df => {
        val base = regexp_extract(ColumnNs.q(req(o, "column")),
          req(o, "pattern"), o.getOrElse("group", "1").toInt)
        df.withColumn(req(o, "outCol"),
          o.get("castTo").map(base.cast).getOrElse(base))
      }),
      // image-text pair curation (LAION/DataComp gates) and
      // pair-granularity dedup as chain steps — the multimodal
      // counterpart of the text curation kinds; frames carry
      // pair_id/payload/caption (+ img_emb/txt_emb or audio_emb for
      // the filters' alignment gate)
      "pair_filter" -> (o => df =>
        graft.multimodal.Pairs.pairFilter(df,
          minWidth = o.getOrElse("minWidth", "8").toInt,
          minHeight = o.getOrElse("minHeight", "8").toInt,
          maxAspect = o.getOrElse("maxAspect", "3.0").toDouble,
          langs = o.getOrElse("langs", "en").split(",").map(_.trim)
            .filter(_.nonEmpty).toSeq,
          minWords = o.getOrElse("minWords", "2").toInt,
          minAlign = o.getOrElse("minAlign", "0.5").toDouble)),
      "pair_dedup" -> (o => df =>
        graft.multimodal.Pairs.pairDedup(df,
          byCaption = o.getOrElse("byCaption", "true").toBoolean)),
      // benchmark decontamination for pair corpora: benchmarkDir is a
      // parquet of (asset_id, payload) eval images; pairs within
      // maxHamming dHash bits of any of them drop
      "pair_decontaminate" -> (o => df =>
        graft.multimodal.Pairs.decontaminatePairs(df,
          df.sparkSession.read.parquet(req(o, "benchmarkDir")),
          maxHamming = o.getOrElse("maxHamming", "0").toInt)),
      "video_pair_filter" -> (o => df =>
        graft.multimodal.Pairs.videoPairFilter(df,
          minFrames = o.getOrElse("minFrames", "2").toInt,
          maxFrames = o.getOrElse("maxFrames", "64").toInt,
          minWidth = o.getOrElse("minWidth", "8").toInt,
          minHeight = o.getOrElse("minHeight", "8").toInt,
          langs = o.getOrElse("langs", "en").split(",").map(_.trim)
            .filter(_.nonEmpty).toSeq,
          minWords = o.getOrElse("minWords", "2").toInt,
          minAlign = o.getOrElse("minAlign", "0.5").toDouble)),
      "audio_pair_filter" -> (o => df =>
        graft.multimodal.Pairs.audioPairFilter(df,
          minMs = o.getOrElse("minMs", "500").toLong,
          maxMs = o.getOrElse("maxMs", (30L * 60 * 1000).toString).toLong,
          minSampleRate = o.getOrElse("minSampleRate", "8000").toInt,
          minMeanAbs = o.getOrElse("minMeanAbs", "0.0").toDouble,
          langs = o.getOrElse("langs", "en").split(",").map(_.trim)
            .filter(_.nonEmpty).toSeq,
          minWords = o.getOrElse("minWords", "2").toInt,
          minAlign = o.getOrElse("minAlign", "0.5").toDouble)),
      "scrub_pii" -> (o => df => {
        val c = req(o, "column")
        df.withColumn(c, graft.llm.TextAnalysis.scrubPii(ColumnNs.q(c)))
      }),
      // gopher=true applies the COMPLETE published Gopher rule set
      // (Rae et al. 2021 constants, each overridable by flag);
      // default stays the legacy relaxed length/word-len/punct bounds
      "quality_filter" -> (o => df => {
        val st = graft.llm.TextAnalysis.qualityStats(ColumnNs.q(req(o, "column")))
        if (o.getOrElse("gopher", "false").toBoolean)
          df.where(graft.llm.TextAnalysis.gopherOk(st,
            minWords = o.getOrElse("minWords", "50").toInt,
            maxWords = o.getOrElse("maxWords", "100000").toInt,
            minMeanWordLen = o.getOrElse("minMeanWordLen", "3.0").toDouble,
            maxMeanWordLen = o.getOrElse("maxMeanWordLen", "10.0").toDouble,
            maxSymbolWordRatio =
              o.getOrElse("maxSymbolWordRatio", "0.1").toDouble,
            maxBulletLineFrac =
              o.getOrElse("maxBulletLineFrac", "0.9").toDouble,
            maxEllipsisLineFrac =
              o.getOrElse("maxEllipsisLineFrac", "0.3").toDouble,
            minAlphaWordFrac =
              o.getOrElse("minAlphaWordFrac", "0.8").toDouble,
            minStopHits = o.getOrElse("minStopHits", "2").toInt))
        else
          df.where(graft.llm.TextAnalysis.qualityOk(st,
            minWords = o.getOrElse("minWords", "10").toInt,
            maxWords = o.getOrElse("maxWords", "100000").toInt,
            minMeanWordLen = o.getOrElse("minMeanWordLen", "2.0").toDouble,
            maxMeanWordLen = o.getOrElse("maxMeanWordLen", "12.0").toDouble,
            maxPunctRatio = o.getOrElse("maxPunctRatio", "0.3").toDouble))
      }),
      "lang_filter" -> (o => df =>
        df.where(graft.llm.TextAnalysis.langId(ColumnNs.q(req(o, "column")))
          === req(o, "lang"))),
      // per-language routed quality gate (FineWeb-2's multilingual
      // shape): one pipeline, a per-language word floor routed by a
      // lang column (or the n-gram langId when none is given); other
      // bounds stay corpus-wide. minWordsByLang: "en=50,zh=20"
      "quality_filter_routed" -> (o => df => {
        val st = graft.llm.TextAnalysis.qualityStats(
          ColumnNs.q(req(o, "column")))
        val langC = o.get("langCol").map(ColumnNs.q).getOrElse(
          graft.llm.TextAnalysis.langId(ColumnNs.q(req(o, "column"))))
        val dflt = o.getOrElse("minWords", "10").toInt
        // validated parse: a malformed entry ('en', 'en=50=x', 'en=abc')
        // must surface as the ValidationException the rest of the config
        // surface raises, not a raw MatchError/NumberFormatException
        val minW = req(o, "minWordsByLang").split(",").map { kv =>
          kv.split("=", 2) match {
            case Array(l, n) if l.trim.nonEmpty &&
                n.trim.matches("\\d+") => l.trim -> n.trim.toInt
            case _ => throw new Pipeline.ValidationException(
              s"quality_filter_routed: bad minWordsByLang entry '$kv' " +
                "(expected lang=count, e.g. en=50)")
          }
        }.foldLeft(lit(dflt): org.apache.spark.sql.Column) {
          case (acc, (l, n)) => when(langC === l, lit(n)).otherwise(acc)
        }
        df.where(graft.llm.TextAnalysis.qualityOkRouted(st, minW,
          maxWords = o.getOrElse("maxWords", "100000").toInt,
          minMeanWordLen = o.getOrElse("minMeanWordLen", "2.0").toDouble,
          maxMeanWordLen = o.getOrElse("maxMeanWordLen", "12.0").toDouble,
          maxPunctRatio = o.getOrElse("maxPunctRatio", "0.3").toDouble))
      }),
      // SFT / conversation prep as chain stages (input: one row per
      // turn with conv/turn/role/content columns; see graft.llm.Sft)
      "sft_validate" -> (o => df => {
        val conv = o.getOrElse("convCol", "conv_id")
        val verdicts = graft.llm.Sft.validateTurns(df, conv,
          o.getOrElse("idxCol", "turn_idx"), o.getOrElse("roleCol", "role"),
          o.getOrElse("contentCol", "content"))
        // keep only turns of structurally valid conversations (the
        // routing twin of P8: malformed conversations drop here; pass
        // annotate: true to keep every turn with ok/reason attached)
        if (o.getOrElse("annotate", "false").toBoolean)
          df.join(verdicts.select(col(conv), col("ok"), col("reason")), conv)
        else df.join(verdicts.where(col("ok")).select(col(conv)), conv)
      }),
      "sft_render" -> (o => df =>
        graft.llm.Sft.render(df, o.getOrElse("convCol", "conv_id"),
          o.getOrElse("idxCol", "turn_idx"), o.getOrElse("roleCol", "role"),
          o.getOrElse("contentCol", "content"))),
      "sft_dedup" -> (o => df =>
        graft.llm.Sft.conversationDedup(df,
          o.getOrElse("convCol", "conv_id"),
          o.getOrElse("idxCol", "turn_idx"), o.getOrElse("roleCol", "role"),
          o.getOrElse("contentCol", "content"))),
      // preference-pair (DPO/RLHF) prep: gate-or-annotate validation,
      // pair-grain dedup, DPO-template render (see graft.llm.Preference)
      "pref_validate" -> (o => df => {
        val v = graft.llm.Preference.validatePairs(df,
          o.getOrElse("promptCol", "prompt"),
          o.getOrElse("chosenCol", "chosen"),
          o.getOrElse("rejectedCol", "rejected"))
        if (o.getOrElse("annotate", "false").toBoolean) v
        else v.where(col("ok")).drop("ok", "reason")
      }),
      "pref_dedup" -> (o => df =>
        graft.llm.Preference.dedupPairs(df,
          o.getOrElse("idCol", "pair_id"),
          o.getOrElse("promptCol", "prompt"),
          o.getOrElse("chosenCol", "chosen"),
          o.getOrElse("rejectedCol", "rejected"))),
      "pref_render" -> (o => df =>
        graft.llm.Preference.renderPairs(df,
          o.getOrElse("promptCol", "prompt"),
          o.getOrElse("chosenCol", "chosen"),
          o.getOrElse("rejectedCol", "rejected"))),
      // nested (HuggingFace messages-array) SFT variants — pure
      // projections, so they compose into stream jobs unchanged
      "sft_validate_nested" -> (o => df => {
        val v = graft.llm.Sft.validateNested(df,
          o.getOrElse("messagesCol", "messages"))
        if (o.getOrElse("annotate", "false").toBoolean) v
        else v.where(col("ok")).drop("n_turns", "ok", "reason")
      }),
      "sft_render_nested" -> (o => df =>
        graft.llm.Sft.renderNested(df,
          o.getOrElse("messagesCol", "messages"))),
      // objective-example construction (T5 span corruption, UL2
      // prefix-LM and R/X/S mixture) as chain stages — curated docs
      // in, (input_text, target_text) seq2seq pairs out, map-only
      "span_corrupt" -> (o => df =>
        graft.llm.Objectives.spanCorrupt(df,
          o.getOrElse("idCol", "doc_id"), o.getOrElse("textCol", "text"),
          spanLen = o.getOrElse("spanLen", "3").toInt,
          density = o.getOrElse("density", "0.15").toDouble,
          salt = o.getOrElse("salt", "graft"))),
      "prefix_lm" -> (o => df =>
        graft.llm.Objectives.prefixLmSplit(df,
          o.getOrElse("idCol", "doc_id"), o.getOrElse("textCol", "text"),
          salt = o.getOrElse("salt", "graft"))),
      "ul2_mixture" -> (o => df =>
        graft.llm.Objectives.ul2Mixture(df,
          o.getOrElse("idCol", "doc_id"), o.getOrElse("textCol", "text"),
          salt = o.getOrElse("salt", "graft"))),
      "fim_transform" -> (o => df =>
        graft.llm.Objectives.fimTransform(df,
          o.getOrElse("idCol", "doc_id"), o.getOrElse("textCol", "text"),
          rate = o.getOrElse("rate", "0.5").toDouble,
          spm = o.getOrElse("spm", "false").toBoolean,
          salt = o.getOrElse("salt", "graft"))),
      // margin-based bitext mining as a chain stage (the CCMatrix
      // product, Artetxe & Schwenk ratio margin + mutual argmax): the
      // frame is ONE embeddings table carrying both sides; langCol +
      // srcLang/tgtLang split it. mode exact = broadcast scan (the
      // audit shape, one side driver-small); mode indexed = persisted-
      // IVF candidate probes via srcIndexDir/tgtIndexDir (each side's
      // kNN from the OTHER side's index — partition-pruned, neither
      // corpus broadcast, disjoint id spaces required). Emits
      // (src_id, tgt_id, cosine, margin).
      "bitext_mine" -> (o => df => {
        val idc = o.getOrElse("idCol", "vec_id")
        val vc = o.getOrElse("vecCol", "embedding")
        val lang = ColumnNs.q(req(o, "langCol"))
        val src = df.where(lang === req(o, "srcLang"))
        val tgt = df.where(lang === req(o, "tgtLang"))
        val k = o.getOrElse("k", "4").toInt
        val th = o.getOrElse("threshold", "1.3").toDouble
        o.getOrElse("mode", "exact") match {
          case "exact" =>
            graft.llm.Bitext.mineBitext(src, tgt, k, th, idc, idc, vc)
          case "indexed" =>
            graft.llm.Bitext.mineBitextIndexed(df.sparkSession,
              req(o, "srcIndexDir"), req(o, "tgtIndexDir"), src, tgt, k, th,
              o.getOrElse("nProbe", "4").toInt, idc, idc, vc)
          case other => throw new Pipeline.ValidationException(
            s"bitext_mine: unknown mode '$other' (exact | indexed)")
        }
      }),
      // render mined bitext to translation-pair training rows: join
      // both ids to a texts table (textsPath parquet) and emit
      // (pair_id, src_id, tgt_id, text) with text = src <sep> tgt —
      // pack_greedy/pack_materialize consume (pair_id, text) directly.
      // Two id-keyed hash joins; the mined set is one-to-one so
      // pair_id = src_id is unique by construction.
      "render_bitext" -> (o => df => {
        val texts = df.sparkSession.read.parquet(req(o, "textsPath"))
          .select(col(o.getOrElse("textsIdCol", "id")).as("__tid"),
            col(o.getOrElse("textsTextCol", "text")).as("__ttext"))
        val sep = o.getOrElse("sep", " ||| ")
        df.join(texts.select(col("__tid").as("src_id"),
            col("__ttext").as("__st")), "src_id")
          .join(texts.select(col("__tid").as("tgt_id"),
            col("__ttext").as("__tt")), "tgt_id")
          .select(col("src_id").as("pair_id"), col("src_id"), col("tgt_id"),
            concat(col("__st"), lit(sep), col("__tt")).as("text"))
      }),
      // contrastive triplet mining as a chain stage (E5/GTE recipe —
      // adjacency positives, cross-document hard negatives): the frame
      // is the chunks table. mode exact = broadcast audit scan; mode
      // indexed = persisted-IVF candidates (indexDir) with the same
      // document-exclusion re-rank tail. Emits
      // (query_id, pos_id, neg_rank, neg_id, neg_cosine).
      "mine_triplets" -> (o => df => {
        val id = o.getOrElse("idCol", "chunk_id")
        val doc = o.getOrElse("docCol", "doc_id")
        val idx = o.getOrElse("idxCol", "chunk_idx")
        val vc = o.getOrElse("vecCol", "embedding")
        val nNeg = o.getOrElse("nNeg", "2").toInt
        o.getOrElse("mode", "exact") match {
          case "exact" =>
            graft.llm.Similarity.mineTriplets(df, nNeg, id, doc, idx, vc)
          case "indexed" =>
            graft.llm.Similarity.mineTripletsIndexed(df.sparkSession,
              req(o, "indexDir"), df, nNeg,
              kCandidates = o.getOrElse("kCandidates", "8").toInt,
              nProbe = o.getOrElse("nProbe", "4").toInt, id, doc, idx, vc)
          case other => throw new Pipeline.ValidationException(
            s"mine_triplets: unknown mode '$other' (exact | indexed)")
        }
      }),
      // code-corpus licensing gate (The Stack's shape): classify the
      // license from header/SPDX markers, keep an allowlist
      "license_filter" -> (o => df => {
        val lic = graft.llm.TextAnalysis.licenseDetect(
          ColumnNs.q(req(o, "column")))
        val allowed = o.getOrElse("allow", "mit,apache-2.0,bsd")
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        if (o.getOrElse("annotate", "false").toBoolean)
          df.withColumn(o.getOrElse("outCol", "license"), lic)
        else df.where(lic.isin(allowed: _*))
      }),
      "sample" -> (o => df =>
        graft.llm.Mixing.deterministicSample(df, req(o, "keyCol"),
          req(o, "fraction").toDouble, o.getOrElse("salt", "graft"))),
      // epoch-phase mix schedule (mid-training re-weighting): one
      // declaration of phase boundaries (token budgets) + per-phase
      // domain weights, compiled per phase through
      // ratesForTargetWeights and executed as phase-salted resamples
      // with global budget admission. phases:
      //   "warmup=2000:src1=0.4,src2=0.4,src3=0.2;anneal=800:src3=0.8,src1=0.2"
      "mix_phase_schedule" -> (o => df =>
        graft.llm.Mixing.phasedMixSchedule(df, req(o, "idCol"),
          req(o, "textCol"), req(o, "domainCol"),
          parsePhases(o, "mix_phase_schedule"),
          o.getOrElse("salt", "graft"))),
      "mix_strata" -> (o => df =>
        graft.llm.Mixing.mixStrata(df, req(o, "stratumCol"), req(o, "keyCol"),
          // rates as "en=0.2,de=0.8"
          rates = req(o, "rates").split(",").map { kv =>
            val Array(k, v) = kv.split("="); k.trim -> v.trim.toDouble
          }.toMap,
          defaultRate = o.getOrElse("defaultRate", "1.0").toDouble,
          salt = o.getOrElse("salt", "graft"))),
      "upsample" -> (o => df =>
        graft.llm.Mixing.upsample(df, req(o, "keyCol"),
          req(o, "rate").toDouble, o.getOrElse("salt", "graft"))),
      // scaling-law ablation ladder: nested deterministic subsamples
      // from one md5 rank (rung <= r ≡ deterministic sample at rate r).
      // rungs: "0.01,0.1,0.5,1.0" — ascending, distinct, in (0,1]
      "ablation_ladder" -> (o => df => {
        val rungs = req(o, "rungs").split(",").map(_.trim).map { r =>
          try r.toDouble
          catch { case _: NumberFormatException =>
            throw new Pipeline.ValidationException(
              s"ablation_ladder: bad rung '$r' (expected a number)")
          }
        }.toSeq
        try graft.llm.Mixing.ablationLadder(df, req(o, "keyCol"), rungs,
          o.getOrElse("salt", "graft"), o.getOrElse("rungCol", "rung"))
        catch { case e: IllegalArgumentException
            if !e.isInstanceOf[Pipeline.ValidationException] =>
          // surface the operator's rung-list invariants as the config
          // surface's uniform failure type
          throw new Pipeline.ValidationException(e.getMessage)
        }
      }),
      // link-graph quality priors as chain stages (graft.llm.LinkGraph):
      // job 1: events -> graph_transitions -> pagerank -> host_prior ->
      // parquet_dir; job 2: documents -> host_prior_gate(priorsPath) —
      // the two-phase handoff shape (classifier_train/classifier_filter)
      "graph_transitions" -> (o => df =>
        graft.llm.LinkGraph.sessionTransitions(df,
          // page identity: a column, or a JSON prop of a props column
          o.get("pageCol").map(ColumnNs.q).getOrElse(
            get_json_object(ColumnNs.q(o.getOrElse("propsCol", "props")),
              "$." + o.getOrElse("pageProp", "k")).cast("long")),
          userCol = o.getOrElse("userCol", "user_id"),
          tsCol = o.getOrElse("tsCol", "ts"),
          tieCol = o.getOrElse("tieCol", "event_id"),
          gapMinutes = o.getOrElse("gapMinutes", "30").toInt)),
      "pagerank" -> (o => df =>
        graft.llm.LinkGraph.pageRank(df,
          iters = o.getOrElse("iters", "3").toInt,
          damping = o.getOrElse("damping", "0.85").toDouble,
          orderedFold = o.getOrElse("orderedFold", "false").toBoolean,
          redistributeDangling =
            o.getOrElse("redistributeDangling", "false").toBoolean)),
      // traced ranks: same recurrence, per-sweep trace persisted under
      // a committed generation of traceDir so pagerank_refresh can
      // later fold only the delta's reach
      "pagerank_trace" -> (o => df =>
        graft.llm.LinkGraph.pageRankTrace(df,
          iters = o.getOrElse("iters", "3").toInt,
          traceDir = req(o, "traceDir"),
          damping = o.getOrElse("damping", "0.85").toDouble,
          orderedFold = o.getOrElse("orderedFold", "false").toBoolean)),
      // traced TrustRank: the seed-base twin (seeds land as a parquet
      // list like any vetted artifact); refreshes through the same
      // pagerank_refresh kind — the generation remembers its mode
      "trustrank_trace" -> (o => df =>
        graft.llm.LinkGraph.trustRankTrace(df,
          df.sparkSession.read.parquet(req(o, "seedsPath")),
          iters = o.getOrElse("iters", "3").toInt,
          traceDir = req(o, "traceDir"),
          damping = o.getOrElse("damping", "0.85").toDouble,
          orderedFold = o.getOrElse("orderedFold", "false").toBoolean)),
      // incremental refresh: the job's frame IS the edge-weight DELTA
      // (aggregate the transitions ledger's new buckets); recomputes
      // only the delta-reached frontier per sweep, chains a new trace
      // generation, equals the full recompute exactly. Works on either
      // trace mode (pagerank/trustrank); deltas above the broadcast
      // limit take the documented full-retrace fallback
      "pagerank_refresh" -> (o => df =>
        graft.llm.LinkGraph.pageRankRefresh(df.sparkSession,
          req(o, "traceDir"), df,
          deltaBroadcastLimit =
            o.getOrElse("deltaBroadcastLimit", "2000000").toLong)),
      // page -> host fold; the prefix/mod map is the synthetic bridge
      // onto the documents table's source domain (real deployments map
      // page URLs to their registered domain upstream).
      // BEHAVIOR CHANGE (round 14): the default accumulation flipped
      // from the bit-exact ordered fold to the partial-agg sum (the
      // scale-safe mode — never a per-host list). Configs that relied
      // on byte-replayable priors must pass orderedFold: 'true'
      "host_prior" -> (o => df =>
        graft.llm.LinkGraph.hostPrior(df,
          concat(lit(o.getOrElse("hostPrefix", "src")),
            (col("node") % o.getOrElse("hostMod", "20").toInt)
              .cast("string")),
          orderedFold =
            o.getOrElse("orderedFold", "false").toBoolean)),
      // epoch-boundary rank refresh, stage 1: the streamed transitions
      // ledger (hits keyed by user/event) aggregated to the edge list
      "finalize_transitions" -> (_ => df =>
        graft.streaming.EventsStream.finalizeTransitions(df)),
      // keyword-targeted selection (the lexical DSIR gate): keep docs
      // scoring >= minScore against a keyword profile. Multi-pass over
      // its input (df/avgdl stats scan + gate scan) — stage-boundary
      // the incoming lazy chain once, the dedup_minhash convention.
      // With indexPath set, the gate serves from a build_postings
      // directory instead: single map-only pass, zero aggregations
      "bm25_gate" -> (o => df => o.get("indexPath") match {
        case Some(ip) =>
          graft.llm.Search.bm25ServeGate(df.sparkSession, ip, df,
            req(o, "query"), req(o, "minScore").toDouble,
            textCol = o.getOrElse("column", "text"))
        case None =>
          graft.llm.Search.bm25Gate(df.localCheckpoint(), req(o, "query"),
            req(o, "minScore").toDouble,
            idCol = o.getOrElse("idCol", "doc_id"),
            textCol = o.getOrElse("column", "text"))
      }),
      // battery retrieval served from a persisted build_postings index:
      // the job's frame IS the query battery (qid, text); each run pays
      // one term-pruned postings read + a broadcast join — never a
      // corpus aggregation (the two-phase classifier_train/filter shape)
      "bm25_serve" -> (o => df =>
        graft.llm.Search.bm25ServeJoinTopK(df.sparkSession,
          req(o, "indexPath"), df, k = o.getOrElse("k", "5").toInt,
          qIdCol = o.getOrElse("qIdCol", "qid"),
          qTextCol = o.getOrElse("qTextCol", "text"))),
      // hybrid contamination triage: the job's frame is the benchmark
      // carrying BOTH query representations (qid, text, embedding);
      // lexical bm25 top-k + semantic cosine top-k fused by
      // reciprocal-rank (rank-only arithmetic — exact cross-engine).
      // With bm25IndexPath + annIndexPath set, BOTH signals answer
      // from their persisted indexes instead (term-pruned postings
      // read + partition-pruned probe — the standing-deployment
      // shape: per-battery cost never touches a corpus aggregation).
      // family selects the vector index: ivf (default — exact cosine
      // re-rank over full stored vectors) or ivfpq (residual ADC over
      // the compressed codes — the 100 TB layout; needs rerankPath,
      // the corpus embeddings the exact re-rank joins). weights
      // ("0.9,0.1" — lexical,semantic) switches the fusion to the
      // weighted convex form; empty = plain reciprocal-rank
      "hybrid_retrieve" -> (o => df => {
        val s = df.sparkSession
        val fuseWeights = o.get("weights")
          .map(_.split(",").map(_.trim.toDouble).toSeq).getOrElse(Nil)
        (o.get("bm25IndexPath"), o.get("annIndexPath")) match {
          case (Some(bp), Some(ap)) =>
            graft.llm.Search.hybridRetrieveIndexed(s, bp, ap, df,
              k = o.getOrElse("k", "5").toInt,
              kPerSignal = o.getOrElse("kPerSignal", "10").toInt,
              k0 = o.getOrElse("k0", "60").toInt,
              nProbe = o.getOrElse("nProbe", "4").toInt,
              qIdCol = o.getOrElse("qIdCol", "qid"),
              qTextCol = o.getOrElse("qTextCol", "text"),
              qVecCol = o.getOrElse("qVecCol", "embedding"),
              family = o.getOrElse("family", "ivf"),
              rerank = o.get("rerankPath").map(s.read.parquet(_)),
              shortlist = o.getOrElse("shortlist", "50").toInt,
              cIdCol = o.getOrElse("cIdCol", "vec_id"),
              cVecCol = o.getOrElse("vecCol", "embedding"),
              weights = fuseWeights)
          case (None, None) =>
            graft.llm.Search.hybridRetrieve(
              s.read.parquet(req(o, "docsPath")),
              s.read.parquet(req(o, "embPath")), df,
              k = o.getOrElse("k", "5").toInt,
              kPerSignal = o.getOrElse("kPerSignal", "10").toInt,
              k0 = o.getOrElse("k0", "60").toInt,
              idCol = o.getOrElse("idCol", "doc_id"),
              textCol = o.getOrElse("column", "text"),
              qIdCol = o.getOrElse("qIdCol", "qid"),
              qTextCol = o.getOrElse("qTextCol", "text"),
              qVecCol = o.getOrElse("qVecCol", "embedding"),
              cIdCol = o.getOrElse("cIdCol", "vec_id"),
              vecCol = o.getOrElse("vecCol", "embedding"),
              weights = fuseWeights)
          case _ => throw new Pipeline.ValidationException(
            "hybrid_retrieve: bm25IndexPath and annIndexPath come as a " +
              "pair — the fusion is either fully inline or fully indexed")
        }
      }),
      "host_prior_gate" -> (o => df =>
        graft.llm.LinkGraph.priorGate(df,
          df.sparkSession.read.parquet(req(o, "priorsPath")),
          o.getOrElse("hostCol", "source"),
          minPrior = req(o, "minPrior").toDouble)),
      // the DoReMi trainer-mix stage as ONE chain step (the published
      // two-phase recipe: measure iterated excess-loss weights on the
      // corpus itself, then resample it under them): weights -> rates
      // -> map-only stratified sample. Multi-pass over its input (CE
      // scan + filter scan), so the stage materializes the incoming
      // lazy chain ONCE first — the dedup_minhash stage-boundary
      // convention
      // production half of the DoReMi two-phase: resample under a
      // PERSISTED rates ledger (the excess_weights sink's layout).
      // Stateless given the ledger — the one kind in the mix family
      // that composes into the streamed curation chain, where the
      // in-flight global measurement (mix_excess) cannot run
      "mix_apply" -> (o => df => {
        val rates = df.sparkSession.read.parquet(req(o, "ratesDir"))
        graft.llm.Mixing.applyRatesLedger(df, rates,
          req(o, "domainCol"), req(o, "keyCol"),
          defaultRate = o.getOrElse("defaultRate", "1.0").toDouble,
          salt = o.getOrElse("salt", "graft"))
      }),
      // production half of the CCNet two-phase: score against a
      // PERSISTED ce_prices ledger and keep docs at or below the
      // absolute maxCe cutoff (derived offline — doc_quantiles /
      // ce_filter_against). Stateless given the ledger, so it composes
      // into the streamed curation chain where the in-flight
      // reference aggregation (ce_filter_against) cannot run.
      // Unscoreable docs (no words) are kept — the no-signal
      // convention
      "ce_apply" -> (o => df => {
        val idc = req(o, "idCol")
        val fn = org.apache.spark.sql.functions
        val prices = df.sparkSession.read.parquet(req(o, "pricesDir"))
        val dropped = graft.llm.TextAnalysis.crossEntropyAgainstPrices(
            df, prices, idc, req(o, "textCol"))
          .where(fn.round(fn.col("ce_against"), 4) >
            req(o, "maxCe").toDouble)
          .select(fn.col("doc_id").as(idc))
        df.join(dropped, Seq(idc), "left_anti")
      }),
      "mix_excess" -> (o => df => {
        val input = df.localCheckpoint()
        graft.llm.Mixing.mixByExcessLoss(input, req(o, "idCol"),
          req(o, "textCol"), req(o, "domainCol"),
          eta = o.getOrElse("eta", "1.0").toDouble,
          steps = o.getOrElse("steps", "1").toInt,
          salt = o.getOrElse("salt", "graft"))
      }),
      "top_k_per_stratum" -> (o => df =>
        graft.llm.Mixing.topKPerStratum(df, req(o, "stratumCol"),
          ColumnNs.q(req(o, "scoreCol")), req(o, "keyCol"),
          req(o, "k").toInt)),
      "strip_repeated_lines" -> (o => df =>
        graft.llm.Dedup.stripRepeatedLines(df, req(o, "idCol"),
          req(o, "textCol"),
          minDocs = o.getOrElse("minDocs", "3").toInt,
          minChars = o.getOrElse("minChars", "1").toInt)),
      "strip_duplicate_spans" -> (o => df =>
        graft.llm.Dedup.stripDuplicateSpans(df, req(o, "idCol"),
          req(o, "textCol"),
          k = o.getOrElse("k", "8").toInt,
          minDocs = o.getOrElse("minDocs", "2").toInt)),
      // variable-length exact substring strip (Lee et al. 2022
      // ExactSubstr granularity: remove every copy of token runs >= L
      // shared across >= minOcc occurrences)
      "strip_duplicate_runs" -> (o => df =>
        graft.llm.ExactSubstr.stripDuplicateRuns(df, req(o, "idCol"),
          req(o, "textCol"),
          L = o.getOrElse("L", "50").toInt,
          minOcc = o.getOrElse("minOcc", "2").toInt)),
      // per-source TOKEN budget admission (trainer-mix allowances in
      // tokens; maxEpochs > 1 loops a source deterministically when
      // the budget exceeds its size). ALWAYS routes through the epochs
      // sampler so the output schema is stable — maxEpochs=1 is
      // spec-identical to the single-pass sampler plus copy_idx=0; a
      // config tuned between 1 and N epochs must not silently change
      // columns under a downstream sink
      "token_budget" -> (o => df =>
        graft.llm.Mixing.tokenBudgetSampleEpochs(df, req(o, "idCol"),
          req(o, "textCol"), req(o, "sourceCol"),
          budget = req(o, "budget").toLong,
          maxEpochs = o.getOrElse("maxEpochs", "1").toInt,
          salt = o.getOrElse("salt", "graft"))),
      // greedy-mode pack materialization: no-split streams + optional
      // (doc + EOS)* separator — feeds training_shards directly
      "pack_greedy_materialize" -> (o => df => {
        graft.llm.Packing.packGreedyMaterialize(
          df.withColumn("__graft_toks", wsToks(o)),
          req(o, "idCol"), col("__graft_toks"),
          budget = req(o, "budget").toLong,
          docsPerGroup = o.getOrElse("docsPerGroup", "4096").toInt,
          numParts = o.getOrElse("numParts", "0").toInt,
          docSep = o.get("docSep"))
      }),
      // "train=0.8,val=0.1,test=0.1" — order defines the hash ladder
      "split" -> (o => df =>
        graft.llm.Mixing.splitByHash(df, req(o, "keyCol"),
          req(o, "weights").split(",").toSeq.map { kv =>
            val Array(n, w) = kv.split("=", 2)
            n.trim -> w.trim.toDouble
          },
          salt = o.getOrElse("salt", "graft"),
          splitCol = o.getOrElse("splitCol", "split"))),
      "chunk_tokens" -> (o => df =>
        graft.llm.TextAnalysis.chunkByTokens(df, req(o, "idCol"),
          req(o, "textCol"),
          chunkTokens = req(o, "chunkTokens").toInt,
          stride = o.getOrElse("stride", req(o, "chunkTokens")).toInt)),
      // learned-BPE token count as a column (Bpe.scala): ladderPath
      // loads a persisted merge table (train once, encode forever);
      // absent -> the default English ladder
      "bpe_token_count" -> (o => df => {
        graft.plans.GraftExtensions.register(df.sparkSession)
        val ladder = o.get("ladderPath")
          .map(graft.llm.Bpe.loadLadder)
          .getOrElse(graft.llm.Bpe.defaultLadder)
        df.withColumn(o.getOrElse("outCol", "n_tokens"),
          graft.llm.Bpe.countCol(ColumnNs.q(req(o, "textCol")), ladder))
      }),
      // unigram-LM token count as a column (Unigram.scala): piecesPath
      // loads a persisted (piece, logprob) table (train once, encode
      // forever — required: unlike BPE there is no default table)
      // encode text to learned-BPE token ARRAYS (the persisted-ladder
      // sibling of bpe_token_count — same ladderPath option name;
      // piecesPath tolerated as an alias): outCol feeds
      // pack_materialize's tokensCol, closing the tokenizer-aware
      // trainer-format chain — curate -> bpe_encode ->
      // pack_materialize(tokensCol) -> shards in one config
      "bpe_encode" -> (o => df => {
        graft.plans.GraftExtensions.register(df.sparkSession)
        val path = o.get("ladderPath").orElse(o.get("piecesPath"))
          .getOrElse(throw new Pipeline.ValidationException(
            "config: bpe_encode requires 'ladderPath'"))
        val merges = graft.llm.Bpe.loadLadder(path)
        df.withColumn(o.getOrElse("outCol", "tokens"),
          graft.llm.Bpe.encodeCol(ColumnNs.q(req(o, "textCol")), merges))
      }),
      // unigram-LM (SentencePiece-style) sibling of bpe_encode: Viterbi
      // segmentation to token arrays from a persisted pieces table
      "unigram_encode" -> (o => df => {
        graft.plans.GraftExtensions.register(df.sparkSession)
        val pieces = graft.llm.Unigram.loadPieces(df.sparkSession,
          req(o, "piecesPath"))
        df.withColumn(o.getOrElse("outCol", "tokens"),
          graft.llm.Unigram.encodeCol(ColumnNs.q(req(o, "textCol")), pieces))
      }),
      "unigram_token_count" -> (o => df => {
        graft.plans.GraftExtensions.register(df.sparkSession)
        val pieces = graft.llm.Unigram.loadPieces(df.sparkSession,
          req(o, "piecesPath"))
        df.withColumn(o.getOrElse("outCol", "n_tokens"),
          graft.llm.Unigram.countCol(ColumnNs.q(req(o, "textCol")), pieces))
      }),
      // URL filtering (the RefinedWeb/FineWeb first stage): either a
      // blocklistPath parquet frame (scale path — broadcast anti-join
      // on host and registrable domain) or small literal
      // blockedDomains, plus blockedKeywords substrings and the
      // http(s)-scheme rule
      "url_filter" -> (o => df => {
        val name = req(o, "column")
        val kws = o.get("blockedKeywords")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(Nil)
        // pslPath: a publicsuffix.org-format rules file (bounded
        // static table; parsed driver-side at config time) makes the
        // blocklist's domain key the TRUE registrable domain, so
        // ccSLD entries (example.co.uk) match their subdomains.
        // DEFAULT (no pslPath): the bundled verbatim PSL excerpt
        // (UrlOps.bundledPsl) — config-driven pipelines get real
        // public-suffix awareness out of the box; pslPath=naive opts
        // back into the last-two-labels key. For rule-less TLDs the
        // PSL's implicit `*` rule reproduces the naive key exactly,
        // so the default only changes behavior where it fixes it
        // (ccSLDs like example.co.uk).
        val psl: Seq[String] = o.get("pslPath") match {
          case Some("naive") => Nil
          case Some(p) => java.nio.file.Files.readAllLines(
            java.nio.file.Paths.get(p)).toArray.map(_.toString).toSeq
          case None =>
            // the bundled-PSL default changes what a literal blocklist
            // ENTRY means: the domain key is now the true registrable
            // domain, so a public-suffix-style entry ('co.uk' meant to
            // blanket-block) no longer matches anything — say so once,
            // loudly, instead of silently passing previously-blocked
            // URLs (round-10 ADVICE)
            if (o.contains("blockedDomains") && pslDefaultNoted
                  .compareAndSet(false, true))
              System.err.println(
                "graft: url_filter resolves blockedDomains against the " +
                "bundled Public Suffix List (the default since round 10): " +
                "entries must be REGISTRABLE domains (example.co.uk), not " +
                "public suffixes ('co.uk' blanket-blocks nothing). Set " +
                "pslPath: naive for the last-two-labels key.")
            graft.llm.UrlOps.bundledPsl
        }
        if (psl.nonEmpty)
          graft.plans.GraftExtensions.register(df.sparkSession)
        o.get("blocklistPath") match {
          case Some(p) =>
            graft.llm.UrlOps.filterByUrl(df, name,
              df.sparkSession.read.parquet(p),
              domainCol = o.getOrElse("domainCol", "domain"),
              blockedKeywords = kws, psl = psl)
          // the literal-list branch gets the SAME psl-aware domain key
          // (a blocklisted ccSLD blocks its subdomains on both paths)
          case None => df.where(graft.llm.UrlOps.urlOk(ColumnNs.q(name),
            o.get("blockedDomains")
              .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
              .getOrElse(Nil), kws, psl = psl))
        }
      }),
      // invisible-character cleanup (zero-width junk out, NBSP -> space)
      // — run before tokenization/dedup stages
      "strip_invisible" -> (o => df => {
        val name = req(o, "column")
        df.withColumn(o.getOrElse("outCol", name),
          graft.llm.TextAnalysis.stripInvisible(ColumnNs.q(name)))
      }),
      // length-bucketed batch assembly (NTILE buckets + fixed batches)
      "length_bucket" -> (o => df =>
        graft.llm.Packing.lengthBucketBatches(
          df.withColumn("__graft_n", size(wsToks(o)).cast("long")),
          req(o, "idCol"), col("__graft_n"),
          o.getOrElse("nBuckets", "16").toInt,
          o.getOrElse("batchSize", "32").toInt)),
      // full Gopher repetition removal (Rae et al. 2021 Table A1):
      // drop docs exceeding any of the thirteen published repetition
      // fractions; each threshold overridable by its field name
      "repetition_filter" -> (o => df => {
        graft.plans.GraftExtensions.register(df.sparkSession)
        val overrides = graft.functions.Repetition.gopherThresholds.flatMap {
          case (name, _) => o.get(name).map(v => name -> v.toDouble)
        }.toMap
        df.where(graft.llm.TextAnalysis.repetitionOk(
          graft.llm.TextAnalysis.repetitionStatsFull(
            ColumnNs.q(req(o, "column"))), overrides))
      }),
      // HTML -> main-content text (the raw-crawl step between
      // warc_responses and the text stages): boilerpipe/jusText
      // density rules via the native graft_html_extract expression
      "html_extract" -> (o => df => {
        graft.plans.GraftExtensions.register(df.sparkSession)
        val name = req(o, "column")
        df.withColumn(o.getOrElse("outCol", name),
          graft.functions.HtmlText.extractCol(ColumnNs.q(name)))
      }),
      // incremental exact dedup against a persisted ledger (parquet of
      // already-ingested content): batch rows whose normalized textCol
      // already appears in the ledger drop, then keep-first within the
      // batch. Compose after url_canonicalize for URL-level
      // cross-snapshot dedup (the dedup_urls_incremental shape).
      "dedup_exact_against" -> (o => df =>
        graft.llm.Dedup.exactDedupAgainst(df,
          df.sparkSession.read.parquet(req(o, "ledgerPath")),
          req(o, "idCol"), req(o, "textCol"))),
      // benchmark decontamination (the published funnel's last gate,
      // between dedup and packing): drop every document sharing
      // >= minOverlaps exact word n-grams with a benchmark/eval table
      // read from benchmarkPath (optionally pre-filtered by benchWhere;
      // benchTextCol names its text column when it differs from the
      // corpus's). The benchmark gram set is the broadcast side — eval
      // suites are small; the 100 TB corpus pays one gram pass and an
      // id-only anti-join.
      "decontaminate" -> (o => df => {
        val textCol = req(o, "textCol")
        val bench0 = df.sparkSession.read.parquet(req(o, "benchmarkPath"))
        val bench1 = o.get("benchWhere").fold(bench0)(w => bench0.where(expr(w)))
        val bench = bench1.select(
          ColumnNs.q(o.getOrElse("benchTextCol", textCol)).as(textCol))
        graft.llm.Dedup.decontaminate(df, bench, req(o, "idCol"), textCol,
          o.getOrElse("n", "8").toInt, o.getOrElse("minOverlaps", "1").toInt)
      }),
      // URL canonicalization before URL-level dedup: case-fold the
      // authority, drop fragments, strip tracking params, normalize
      // trailing slashes — in place, or to outCol
      "url_canonicalize" -> (o => df => {
        val name = req(o, "column")
        df.withColumn(o.getOrElse("outCol", name),
          graft.llm.UrlOps.canonicalizeUrl(ColumnNs.q(name)))
      }),
      // registrable-domain column derivation (map-only): the DoReMi
      // mix stage needs a domain dimension, and on a raw crawl that
      // dimension is the URL's registrable domain. `psl: bundled`
      // routes through the public-suffix walk (ccSLD-correct — the
      // 100 TB path for real crawls, where `co.uk`-style suffixes
      // make last-two-labels wrong); the default is the naive
      // last-two-labels key, which is exactly SQL-replayable.
      "url_domain" -> (o => df => {
        val host = graft.llm.UrlOps.urlHost(ColumnNs.q(req(o, "column")))
        df.withColumn(o.getOrElse("outCol", "domain"),
          if (o.get("psl").contains("bundled"))
            graft.llm.UrlOps.registrableDomain(host, graft.llm.UrlOps.bundledPsl)
          else graft.llm.UrlOps.urlDomain(host))
      }),
      // generic row filter — the minimal predicate surface config-side
      // compositions need (a takedown list is often "every doc from
      // these publishers", not pre-resolved ids). Exactly ONE of
      // equals | in (comma-separated) | matches (regex); `not: 'true'`
      // negates. Anything richer belongs in code, not YAML.
      "where" -> (o => df => {
        val c = ColumnNs.q(req(o, "column"))
        val pred = (o.get("equals"), o.get("in"), o.get("matches")) match {
          case (Some(v), None, None) => c === v
          case (None, Some(vs), None) =>
            c.isin(vs.split(",").map(_.trim).toSeq: _*)
          case (None, None, Some(re)) => c.rlike(re)
          case _ => throw new Pipeline.ValidationException(
            "config: 'where' needs exactly one of equals | in | matches")
        }
        df.where(if (o.getOrElse("not", "false").toBoolean) !pred else pred)
      }),
      // C4 cleaning (Raffel et al. 2020 §2.2): line-level clean (keep
      // terminal-punct lines with >= minLineWords words and no
      // "javascript"), then drop pages failing the page rules (curly
      // brace / lorem ipsum / < minSentences sentences / bad words).
      // The column is REPLACED by its cleaned text, matching C4's
      // published pipeline.
      "c4_filter" -> (o => df => {
        val name = req(o, "column")
        val bad = o.get("badWords")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(Nil)
        df.withColumn("__c4_clean", graft.llm.TextAnalysis.c4CleanLines(
            ColumnNs.q(name), o.getOrElse("minLineWords", "5").toInt))
          .where(graft.llm.TextAnalysis.c4PageOk(ColumnNs.q(name),
            col("__c4_clean"), o.getOrElse("minSentences", "3").toInt, bad))
          .withColumn(name, col("__c4_clean")).drop("__c4_clean")
      }),
      // NO-SPLIT greedy packing assignment: docs land wholly in one
      // pack (padding-aware mode for doc-attention/instruction
      // trainers); emits (doc_id, n_tokens, pack_id, oversize)
      "pack_greedy" -> (o => df => {
        graft.llm.Packing.packGreedy(
          df.withColumn("__graft_n", size(wsToks(o)).cast("long")),
          req(o, "idCol"), col("__graft_n"),
          budget = req(o, "budget").toLong,
          docsPerGroup = o.getOrElse("docsPerGroup", "4096").toInt,
          numParts = o.getOrElse("numParts", "0").toInt)
      }),
      // In-Context-Pretraining ordering: bounded-group greedy
      // nearest-neighbor chain over an embedding column, appended as a
      // non-negative `semantic_rank` — compose with pack_curriculum
      // (scoreCol: semantic_rank) for ICLM-ordered context windows
      "semantic_order" -> (o => df => {
        val idc = req(o, "idCol")
        val order = graft.llm.Packing.semanticChainOrder(df, idc,
          req(o, "vecCol"),
          docsPerGroup = o.getOrElse("docsPerGroup", "64").toInt,
          numParts = o.getOrElse("numParts", "0").toInt)
        df.join(order.select(col("doc_id").as(idc), col("semantic_rank")),
          idc)
      }),
      // curriculum packing: ascending (scoreCol, id) order — compose
      // after classifier_score / quality_bucket / length derivations
      "pack_curriculum" -> (o => df => {
        graft.llm.Packing.packByScore(
          df.withColumn("__graft_n", size(wsToks(o)).cast("long")),
          req(o, "idCol"), ColumnNs.q(req(o, "scoreCol")),
          col("__graft_n"), budget = req(o, "budget").toLong,
          numParts = o.getOrElse("numParts", "0").toInt)
      }),
      // bucket-then-pack (the composition real trainers run): NTILE
      // length buckets, then the no-split greedy fold WITHIN each
      // bucket in length order — tighter packs than stream-order
      // pack_greedy because consecutive docs have near-equal lengths.
      // Emits (doc_id, n_tokens, bucket, pack_id, oversize).
      "bucketed_pack" -> (o => df => {
        graft.llm.Packing.bucketedPackGreedy(
          df.withColumn("__graft_n", size(wsToks(o)).cast("long")),
          req(o, "idCol"), col("__graft_n"),
          nBuckets = o.getOrElse("nBuckets", "16").toInt,
          budget = req(o, "budget").toLong,
          docsPerGroup = o.getOrElse("docsPerGroup", "4096").toInt,
          numParts = o.getOrElse("numParts", "0").toInt)
      }),
      // trainer-format assembly: concatenate token streams into
      // budget-sized context packs ([[graft.llm.Packing.packMaterialize]]).
      // `tokensCol` names an existing array<string> column; absent ->
      // whitespace tokens of `textCol`. Token-less docs carry nothing
      // into a pack and are dropped (the pack_materialize query's
      // convention). Output frame: (pack_id, n_docs, n_tokens, tokens).
      "pack_materialize" -> (o => df => {
        graft.llm.Packing.packMaterialize(
          df.withColumn("__graft_toks", wsToks(o))
            .where(size(col("__graft_toks")) > 0),
          req(o, "idCol"), col("__graft_toks"),
          budget = req(o, "budget").toLong,
          numParts = o.getOrElse("numParts", "0").toInt)
      }),
      // drop both compression-ratio tails (too repetitive / too random);
      // empty texts carry no signal and are kept
      "compression_filter" -> (o => df => {
        graft.plans.GraftExtensions.register(df.sparkSession)
        df.where(graft.llm.TextAnalysis.compressionOk(
          ColumnNs.q(req(o, "textCol")),
          o.getOrElse("minRatio", "0.2").toDouble,
          o.getOrElse("maxRatio", "0.4").toDouble))
      }),
      // CCNet tail-drop: bucket by cross-entropy quantile, keep bands
      // 1..keepBuckets (head = most fluent). Anti-join on the DROPPED
      // set, so unscoreable docs (null/empty text — no CE row) are
      // kept, matching compression_filter's no-signal convention
      "quality_bucket_filter" -> (o => df => {
        val keep = o.getOrElse("keepBuckets", "8").toInt
        val n = o.getOrElse("nBuckets", "10").toInt
        val idc = req(o, "idCol")
        val dropped = graft.llm.TextAnalysis.qualityBuckets(df, idc,
            req(o, "textCol"), n)
          .where(org.apache.spark.sql.functions.col("bucket") > keep)
          .select(org.apache.spark.sql.functions.col("doc_id").as(idc))
        df.join(dropped, Seq(idc), "left_anti")
      }),
      // CCNet's cross-corpus selection: score every doc against a
      // REFERENCE-trained unigram LM (the wiki pricing CC —
      // TextAnalysis.crossEntropyAgainst) and keep the most
      // reference-like `keepFraction` (ce <= the rounded quantile
      // threshold, ties kept). Anti-join on the DROPPED set, so
      // unscoreable docs (null/empty text — no CE row) are kept,
      // matching quality_bucket_filter's no-signal convention
      "ce_filter_against" -> (o => df => {
        val idc = req(o, "idCol")
        val keep = o.getOrElse("keepFraction", "0.8").toDouble
        require(keep > 0.0 && keep <= 1.0,
          s"ce_filter_against: keepFraction must be in (0,1], got $keep")
        val fn = org.apache.spark.sql.functions
        val ref = df.sparkSession.read.parquet(req(o, "refPath"))
        val ce = graft.llm.TextAnalysis.crossEntropyAgainst(df, ref,
            idc, req(o, "textCol"), o.getOrElse("refTextCol", "text"))
          .select(fn.col("doc_id"),
            fn.round(fn.col("ce_against"), 4).as("__ce"))
        val th = graft.llm.TextAnalysis.quantiles(ce, fn.col("__ce"),
            Seq(keep))
          .select(fn.round(fn.col("q"), 4).as("__th"))
        val dropped = ce.crossJoin(fn.broadcast(th))
          .where(fn.col("__ce") > fn.col("__th"))
          .select(fn.col("doc_id").as(idc))
        df.join(dropped, Seq(idc), "left_anti")
      }),
      "nfc_normalize" -> (o => df => {
        graft.plans.GraftExtensions.register(df.sparkSession)
        val c = req(o, "column")
        df.withColumn(c, org.apache.spark.sql.functions.call_function(
          "graft_nfc", ColumnNs.q(c)))
      }),
      // SemDeDup semantic dedup over an embedding column: drops rows
      // with a lower-id near-twin in their k-means cluster
      "semdedup" -> (o => df =>
        graft.llm.Similarity.semDedup(df,
          threshold = o.getOrElse("threshold", "0.95").toDouble,
          nClusters = o.getOrElse("nClusters", "16").toInt,
          idCol = o.getOrElse("idCol", "vec_id"),
          vecCol = o.getOrElse("vecCol", "embedding"),
          maxCluster = o.getOrElse("maxCluster", "10000").toInt,
          fitFraction = o.getOrElse("fitFraction", "1.0").toDouble)),
      // D4 diversity pruning (the published step AFTER semdedup): drop
      // the most prototypical keepFraction complement per cluster —
      // highest cosine to the cluster centroid — keeping diverse data
      "diversity_prune" -> (o => df =>
        graft.llm.Similarity.diversityPrune(df,
          keepFraction = o.getOrElse("keepFraction", "0.8").toDouble,
          nClusters = o.getOrElse("nClusters", "16").toInt,
          idCol = o.getOrElse("idCol", "vec_id"),
          vecCol = o.getOrElse("vecCol", "embedding"),
          fitFraction = o.getOrElse("fitFraction", "1.0").toDouble)),
      // SemDeDup with quality-aware survivor selection: each semantic-
      // twin cluster keeps its max-`scoreCol` member (ties to lowest
      // id) instead of keep-first — the "keep the best duplicate"
      // policy (Dedup.nearDupClustersBest) as a config step
      "semdedup_best" -> (o => df => {
        val idc = o.getOrElse("idCol", "vec_id")
        val scoreCol = o.getOrElse("scoreCol", "score")
        graft.llm.Similarity.semDedupBest(df,
          df.select(ColumnNs.q(idc), ColumnNs.q(scoreCol)),
          scoreCol = scoreCol,
          threshold = o.getOrElse("threshold", "0.95").toDouble,
          nClusters = o.getOrElse("nClusters", "16").toInt,
          idCol = idc,
          vecCol = o.getOrElse("vecCol", "embedding"),
          maxCluster = o.getOrElse("maxCluster", "10000").toInt,
          fitFraction = o.getOrElse("fitFraction", "1.0").toDouble)
      }),
      // hashed-linear-classifier quality filter: scores via a trained
      // (bucket, weight) parquet table (weightsPath; absent -> the
      // seeded fixture table) and keeps rows scoring >= minScore;
      // unscoreable docs (no features -> null score) are kept — the
      // no-signal convention shared with compression_filter. Scoring
      // runs through the fused native scalar (graft_clf_score), so the
      // whole filter is MAP-ONLY — the earlier aggregation+anti-join
      // form paid a corpus shuffle per filter pass
      "classifier_filter" -> (o => df => {
        graft.plans.GraftExtensions.register(df.sparkSession)
        val nBuckets = o.getOrElse("nBuckets", "10000").toInt
        val wts = graft.llm.Importance.weightArray(
          o.get("weightsPath")
            .map(df.sparkSession.read.parquet(_))
            .getOrElse(graft.llm.Importance.seededWeights(
              df.sparkSession, nBuckets)),
          nBuckets)
        val score = graft.llm.Importance.classifierScoreColNative(
          ColumnNs.q(req(o, "textCol")), wts)
        df.where(score.isNull ||
          score >= o.getOrElse("minScore", "0.5").toDouble)
      }))

  /** load kind -> (options => LoadStep). */
  val loadKinds: collection.mutable.Map[String, Options => Sinks.LoadStep] =
    collection.mutable.Map(
      "json" -> (o => Sinks.Write("json", df =>
        scoped(df, o)(d => Sinks.writeJsonSingle(d,
          Sinks.destination(dir(o), file(o), overwrite(o)),
          pretty = o.getOrElse("pretty", "false").toBoolean)))),
      "csv" -> (o => Sinks.Write("csv", df =>
        scoped(df, o)(d => Sinks.writeCsvSingle(d,
          Sinks.destination(dir(o), file(o), overwrite(o)))))),
      "json_dir" -> (o => Sinks.Write("json_dir", df =>
        scoped(df, o)(d => Sinks.writeJson(d, req(o, "path"))))),
      // generic parquet table writer — the chain-stage handoff sink (a
      // job materializes a derived store another job's extract reads)
      "parquet_dir" -> (o => Sinks.Write("parquet_dir", df =>
        scoped(df, o)(d => d.write
          .mode(o.getOrElse("mode", "overwrite")).parquet(req(o, "path"))))),
      "shards" -> (o => Sinks.Write("shards", df =>
        Sinks.writeShards(df, req(o, "keyCol"), req(o, "path"),
          req(o, "nShards").toInt,
          format = o.getOrElse("format", "parquet")))),
      // persisted ANN indexes as config-driven loads: the PQ codes
      // frame (32x-compressed searchable corpus) and the IVF-PQ
      // composite (cluster-partitioned residual codes) — the
      // build-once artifacts queries and appends consume
      // measure-and-persist the excess-loss domain weights + executable
      // keep rates (the DoReMi step as a model-producing sink, the
      // classifier_train convention): downstream configs feed the
      // written rates into mix_strata
      "excess_weights" -> (o => Sinks.Write("excess_weights", df => {
        val eta = o.getOrElse("eta", "1.0").toDouble
        // steps > 1 routes through the iterated multi-step loop; the
        // default stays the single-step measurement for existing
        // configs (steps=1 through the iterated path is numerically
        // identical, but the single-step code is one scan cheaper)
        val weights = o.get("steps").map(_.toInt) match {
          case Some(n) if n > 1 =>
            graft.llm.Mixing.excessLossWeightsIter(df,
              req(o, "idCol"), req(o, "textCol"), req(o, "domainCol"),
              eta = eta, steps = n)
          case _ =>
            graft.llm.Mixing.excessLossWeights(df,
              req(o, "idCol"), req(o, "textCol"), req(o, "domainCol"),
              eta = eta)
        }
        graft.llm.Mixing.ratesForTargetWeights(weights)
          .coalesce(1) // one tiny row-per-domain table
          .write.mode("overwrite").parquet(req(o, "dir"))
        ()
      })),
      // achieved-vs-target mix report (the trainer-mix datacard row):
      // targets as 'domain:weight,domain:weight'; token counts from a
      // numeric tokensCol or whitespace-counted textCol. The report
      // lands at reportDir; failOnOff=true raises on any out-of-
      // tolerance domain — the post-mix gate
      "mix_report" -> (o => Sinks.Write("mix_report", df => {
        val fn = org.apache.spark.sql.functions
        val targets = req(o, "targets").split(",").map { kv =>
          kv.split(":") match {
            case Array(k, v) => k.trim -> v.trim.toDouble
            case _ => throw new IllegalArgumentException(
              s"mix_report: malformed targets entry '$kv' " +
                "(want domain:weight,domain:weight)")
          }
        }.toMap
        val toks = o.get("tokensCol") match {
          case Some(c) => ColumnNs.q(c).cast("long")
          case None => graft.llm.TextAnalysis.wsTokenCount(
            ColumnNs.q(req(o, "textCol"))).cast("long")
        }
        val report = graft.llm.Mixing.mixReport(df,
          req(o, "domainCol"), toks, targets,
          tol = o.getOrElse("tol", "0.02").toDouble)
        val out = req(o, "reportDir")
        report.write.mode("overwrite").parquet(out)
        if (o.getOrElse("failOnOff", "false").toBoolean) {
          val bad = df.sparkSession.read.parquet(out)
            .where(!fn.col("ok")).count()
          require(bad == 0L,
            s"mix_report: $bad domain(s) outside tolerance")
        }
        ()
      })),
      // build-once CCNet reference LM: persist the (word, nlp) price
      // table (+ the '' sentinel unseen-price row) from the job's
      // frame — the reference corpus. Downstream configs feed it into
      // the stateless ce_apply transform (the excess_weights →
      // mix_apply two-phase convention)
      "ce_prices" -> (o => Sinks.Write("ce_prices", df => {
        graft.llm.TextAnalysis.cePrices(df,
            o.getOrElse("textCol", "text"))
          .write.mode("overwrite").parquet(req(o, "dir"))
        ()
      })),
      "pq_index" -> (o => Sinks.Write("pq_index", df => {
        graft.llm.Similarity.buildPqIndex(df, req(o, "dir"),
          m = o.getOrElse("m", "8").toInt,
          k = o.getOrElse("k", "16").toInt,
          cIdCol = o.getOrElse("idCol", "vec_id"),
          vecCol = o.getOrElse("vecCol", "embedding"))
        ()
      })),
      "ivfpq_index" -> (o => Sinks.Write("ivfpq_index", df => {
        graft.llm.Similarity.buildIvfPqIndex(df, req(o, "dir"),
          nCentroids = o.getOrElse("nCentroids", "16").toInt,
          m = o.getOrElse("m", "8").toInt,
          k = o.getOrElse("k", "16").toInt,
          cIdCol = o.getOrElse("idCol", "vec_id"),
          vecCol = o.getOrElse("vecCol", "embedding"))
        ()
      })),
      "ledger" -> (o => Sinks.Write("ledger", df =>
        Sinks.writeLedger(df, req(o, "dir"), req(o, "name"),
          o.getOrElse("runId", System.currentTimeMillis().toString),
          uidCol = o.getOrElse("uidCol", "etl.uid")))),
      "debug" -> (o => Sinks.Write("debug", df =>
        Sinks.debug(df, o.getOrElse("n", "20").toInt))),
      "partitioned" -> (o => Sinks.Write("partitioned", df =>
        Sinks.writePartitioned(df, req(o, "path"),
          req(o, "partCols").split(",").map(_.trim).toSeq,
          format = o.getOrElse("format", "parquet")))),
      // trainer-shard writer: deterministic md5-rank shuffle into
      // `dir/data/shard=N` parquet dirs plus the RE-READ certified
      // manifest at `dir/manifest` ([[graft.llm.Packing.writeTrainingShards]]
      // — the manifest certifies what landed on disk, not what was
      // intended). With the pack_materialize transform upstream this
      // completes the config-driven trainer-format path:
      // tokenize -> pack -> materialize -> certified shards, one YAML job.
      "training_shards" -> (o => Sinks.Write("training_shards", df => {
        graft.llm.Packing.writeTrainingShards(df, req(o, "idCol"),
          req(o, "dir"), req(o, "nShards").toInt)
        ()
      })),
      // the streamed-assignment -> certified-shards handoff (the epoch
      // boundary of a continuous ingest): the job's frame is the
      // DOCUMENT STORE; assignmentDir holds the pack assignment
      // appendPackStream accumulated. Joins member token streams back
      // by id (failing loudly on store/assignment drift), assembles
      // packs, and writes dir/data + the re-read certified manifest —
      // streamed assignment + this step == the one-shot
      // pack_materialize -> training_shards chain over the same docs.
      // epochSalt (+ budget, required with it): shuffled epoch-boundary
      // shards — re-pack the ledger's membership in epoch-salted
      // md5-rank order so streamed pipelines ship trainer-ready
      // shuffled shards; each epoch's salt draws an independent
      // deterministic order
      "materialize_shards" -> (o => Sinks.Write("materialize_shards", df => {
        graft.llm.Packing.materializeShardsFromAssignment(df.sparkSession,
          req(o, "assignmentDir"), df, req(o, "idCol"), wsToks(o),
          req(o, "dir"), req(o, "nShards").toInt,
          docSep = o.get("sep"),
          epochSalt = o.get("epochSalt"),
          epochBudget = o.get("budget").map(_.toLong).getOrElse(0L))
        ()
      })),
      // the epoch-phase mix schedule composed into the shard product:
      // each phase's admitted docs pack and materialize into their own
      // zero-padded generation dir (dir/phase-0000, …) — the phased
      // trainer deliverable (warmup shards, then anneal shards under
      // the shifted mix). phases: "name=budget:domain=w,...;..."
      "phased_shards" -> (o => Sinks.Write("phased_shards", df => {
        graft.llm.Packing.phasedShards(df, req(o, "idCol"),
          req(o, "textCol"), req(o, "domainCol"),
          parsePhases(o, "phased_shards"),
          packBudget = req(o, "budget").toLong,
          dir = req(o, "dir"),
          nShards = req(o, "nShards").toInt,
          salt = o.getOrElse("salt", "graft"))
        ()
      })),
      // train the hashed-linear quality classifier on the incoming
      // labeled frame and persist the (bucket, weight) table that
      // classifier_filter's weightsPath loads — the model-producing
      // half of the model-based quality-filter loop
      "classifier_train" -> (o => Sinks.Write("classifier_train", df => {
        graft.llm.Importance.trainClassifier(df,
            req(o, "idCol"), req(o, "textCol"), req(o, "labelCol"),
            nBuckets = o.getOrElse("nBuckets", "10000").toInt,
            iters = o.getOrElse("iters", "30").toInt,
            learnRate = o.getOrElse("learnRate", "2.0").toDouble,
            l2 = o.getOrElse("l2", "0.0").toDouble,
            sampleFraction = o.getOrElse("sampleFraction", "1.0").toDouble)
          .coalesce(1).write.mode("overwrite").parquet(req(o, "path"))
      })),
      // build the BM25 postings index (postings + df + scalar stats)
      // that bm25_serve / bm25_gate(indexPath) / the bm25 search
      // stream serve from — the build-once half of the lexical
      // two-phase deployment (classifier_train's shape)
      "build_postings" -> (o => Sinks.Write("build_postings", df => {
        graft.llm.Search.buildPostings(df, req(o, "path"),
          idCol = o.getOrElse("idCol", "doc_id"),
          textCol = o.getOrElse("column", "text"),
          shards = o.getOrElse("shards", "32").toInt)
      })),
      // incremental postings append: the job's frame is the NEW (not
      // yet indexed) documents — one pass over just the batch; column
      // names come from the index's own stats
      "append_postings" -> (o => Sinks.Write("append_postings", df => {
        graft.llm.Search.appendPostings(df.sparkSession, req(o, "path"),
          df, shards = o.getOrElse("shards", "4").toInt)
      })),
      // staleness-gated postings rebuild (the reindex_if_drifted shape
      // for the lexical index): the job's frame is the CURRENT corpus;
      // the audit row appends to the maintenance ledger
      "rebuild_postings_if_stale" ->
        (o => Sinks.Write("rebuild_postings_if_stale", df => {
          val path = req(o, "path")
          graft.llm.Search.rebuildPostingsIfStale(df.sparkSession, path,
              df, staleFloor = req(o, "staleFloor").toDouble,
              shards = o.getOrElse("shards", "32").toInt,
              contentHash = o.getOrElse("contentHash", "false").toBoolean)
            .write.mode("append")
            .parquet(o.getOrElse("reportDir", s"$path/maintenance"))
        })),
      // seed the streamed-curation ledger layout (assign + hashes +
      // sigs when nearDupThreshold is set) from a batch corpus — the
      // "ledger present before the stream starts" convention as a
      // registry step. Curation belongs in the job's TRANSFORM stages
      // (the same kinds the stream job's `curate:` list resolves);
      // this sink runs the in-batch exact (+ optional near-) dedup
      // and packs the survivors one-shot.
      "seed_curated_pack" -> (o => Sinks.Write("seed_curated_pack", df => {
        graft.streaming.IndexIngest.seedCuratedPack(df, req(o, "dir"),
          req(o, "idCol"), req(o, "textCol"), req(o, "budget").toLong,
          nearDupThreshold = o.get("nearDupThreshold").map(_.toDouble),
          k = o.getOrElse("k", "64").toInt,
          bands = o.getOrElse("bands", "16").toInt,
          maxBucket = o.getOrElse("maxBucket", "1000").toInt)
      })),
      // takedown: the job's frame IS the retraction id list (a
      // takedown list lands as CSV/parquet like any other source);
      // removes those docs from the curated-pack ledgers. Epoch
      // boundary only — see IndexIngest.retractFromCuratedPack.
      "retract_pack" -> (o => Sinks.Write("retract_pack", df => {
        graft.streaming.IndexIngest.retractFromCuratedPack(
          df.sparkSession, req(o, "dir"), df, req(o, "idCol"),
          repack = o.getOrElse("repack", "false").toBoolean,
          budget = o.getOrElse("budget", "0").toLong,
          forgetDocs = o.get("forgetDocsPath")
            .map(p => df.sparkSession.read.parquet(p)),
          forgetTextCol = o.getOrElse("forgetTextCol", "text"),
          tag = o.getOrElse("tag", ""))
        () // ledger rewrites are eager; the report frame is advisory
      })),
      // takedown over the persisted VECTOR indexes: the frame IS the
      // retraction id list; scrubs assignments/codes across EVERY
      // generation (a retired generation is a rollback target)
      "retract_vector_index" ->
        (o => Sinks.Write("retract_vector_index", df => {
          graft.streaming.IndexIngest.retractFromVectorIndex(
            df.sparkSession, req(o, "dir"), df, req(o, "idCol")).count()
          () // ledger rewrites are eager; the report frame is advisory
        })),
      // takedown over the persisted BM25 postings index: the frame IS
      // the retraction id list; tombstones the ids and patches
      // df/n/avgdl exactly, so serving equals a rebuild over the
      // surviving corpus without rewriting the postings
      "retract_postings" -> (o => Sinks.Write("retract_postings", df => {
        graft.llm.Search.retractPostings(df.sparkSession,
          req(o, "dir"), df, req(o, "idCol")).count()
        () // the audit row is advisory; the delta commit is eager
      })),
      // fold the BM25 maintenance event log (appends + retraction
      // tombstones) into one fresh committed generation — no corpus
      // re-tokenize, serving bit-identical before/after
      "compact_postings" -> (o => Sinks.Write("compact_postings", df => {
        graft.llm.Search.compactPostings(df.sparkSession,
          req(o, "path"),
          shards = o.getOrElse("shards", "32").toInt).count()
        () // the audit row is advisory; the generation swap is eager
      })),
      // fold ONE append-mode parquet ledger directory (answer
      // ledgers, transitions ledgers, report dirs) — hive partitions
      // detected and preserved; epoch boundary only
      "compact_ledger_dir" ->
        (o => Sinks.Write("compact_ledger_dir", df => {
          graft.streaming.IndexIngest.compactLedgerDir(df.sparkSession,
            req(o, "dir"),
            shards = o.getOrElse("shards", "4").toInt).count()
          ()
        })),
      // fold the curated-pack ledgers' per-batch files (assign/
      // hashes/sigs/retracted) — epoch boundary only, content
      // row-identical; the restarted stream dedups against the
      // folded ledgers identically
      "compact_pack_ledger" ->
        (o => Sinks.Write("compact_pack_ledger", df => {
          graft.streaming.IndexIngest.compactCuratedPack(df.sparkSession,
            req(o, "dir"),
            shards = o.getOrElse("shards", "4").toInt).count()
          () // the audit rows are advisory; the rewrites are eager
        })),
      // fold an appended vector index's batch-sized segment files
      // into one fresh committed generation — quantizer state copied
      // verbatim (no refit), serving identical row for row; reclaim
      // retired generations via the existing vacuum
      "compact_vector_index" ->
        (o => Sinks.Write("compact_vector_index", df => {
          graft.llm.Similarity.compactVectorIndex(df.sparkSession,
            req(o, "dir"),
            shards = o.getOrElse("shards", "32").toInt).count()
          () // the audit row is advisory; the generation swap is eager
        })),
      // garbage-collect retired postings surfaces (committed
      // generations once the serving swap has soaked past the grace
      // window; uncommitted stragglers past their own grace age) —
      // the reclamation half build/compact deliberately defer
      "vacuum_postings" -> (o => Sinks.Write("vacuum_postings", df => {
        graft.llm.Search.vacuumPostings(df.sparkSession,
          req(o, "path"),
          graceMs = o.getOrElse("graceMs",
            (6L * 3600L * 1000L).toString).toLong)
        ()
      })),
      // garbage-collect retired rank-trace generations (committed
      // non-serving ones; uncommitted stragglers past the grace age)
      "vacuum_rank_trace" -> (o => Sinks.Write("vacuum_rank_trace", df => {
        graft.llm.LinkGraph.vacuumRankTrace(df.sparkSession,
          req(o, "dir"))
        ()
      })),
      // takedown reversal: the frame IS the restore id list; matched
      // scrub-retracted rows re-enter the assignment verbatim and
      // re-queue their packs for the next refresh_shards
      "unretract_pack" -> (o => Sinks.Write("unretract_pack", df => {
        graft.streaming.IndexIngest.unretractFromCuratedPack(
          df.sparkSession, req(o, "dir"), df, req(o, "idCol"),
          forgetDocs = o.get("forgetDocsPath")
            .map(p => df.sparkSession.read.parquet(p)),
          forgetTextCol = o.getOrElse("forgetTextCol", "text"),
          k = o.getOrElse("k", "64").toInt,
          tag = o.getOrElse("tag", ""))
        ()
      })),
      // incremental shard refresh after scrub-mode retraction: drain
      // the dir/retracted queue and rewrite ONLY the affected shard
      // partitions (the frame is the document store, as for
      // materialize_shards). nShards must match the materialize call.
      "refresh_shards" -> (o => Sinks.Write("refresh_shards", df => {
        graft.llm.Packing.refreshRetractedShards(df.sparkSession,
          req(o, "ledgerDir"), df, req(o, "idCol"), wsToks(o),
          req(o, "dir"), req(o, "nShards").toInt, docSep = o.get("sep"))
        ()
      })),
      // read-only shard integrity audit: re-derive the manifest
      // aggregates from dir/data and diff against dir/manifest; the
      // per-shard report lands at reportDir (default dir/audit). With
      // failOnBad=true any non-ok shard raises — the pre-training gate
      "audit_shards" -> (o => Sinks.Write("audit_shards", df => {
        val dir = req(o, "dir")
        val report = graft.llm.Packing.auditShards(df.sparkSession, dir)
        report.write.mode("overwrite")
          .parquet(o.getOrElse("reportDir", s"$dir/audit"))
        if (o.getOrElse("failOnBad", "false").toBoolean) {
          val bad = df.sparkSession.read
            .parquet(o.getOrElse("reportDir", s"$dir/audit"))
            .where(org.apache.spark.sql.functions.col("status") =!= "ok")
            .count()
          require(bad == 0L,
            s"audit_shards: $bad shard(s) failed the integrity audit at $dir")
        }
        ()
      })),
      // drift-triggered index maintenance: reindex a persisted vector
      // index from the CURRENT corpus into a fresh generation with an
      // atomic serving swap (Similarity.reindex*). family: ivf reads
      // the corpus back from the serving generation's own assignments
      // (the job's frame is ignored); pq/ivfpq re-encode the job's
      // frame (the exact-re-rank corpus, covering every indexed id)
      "reindex_index" -> (o => Sinks.Write("reindex_index", df => {
        val dir = req(o, "dir")
        o.getOrElse("family", "ivf") match {
          case "ivf" => graft.llm.Similarity.reindexIvf(df.sparkSession, dir,
            nCentroids = o.getOrElse("nCentroids", "16").toInt,
            seed = o.getOrElse("seed", "42").toLong)
          case "pq" => graft.llm.Similarity.reindexPq(df.sparkSession, dir,
            df, m = o.getOrElse("m", "8").toInt,
            k = o.getOrElse("k", "16").toInt,
            cIdCol = o.getOrElse("idCol", "vec_id"),
            vecCol = o.getOrElse("vecCol", "embedding"))
          case "ivfpq" => graft.llm.Similarity.reindexIvfPq(df.sparkSession,
            dir, df, nCentroids = o.getOrElse("nCentroids", "16").toInt,
            m = o.getOrElse("m", "8").toInt,
            k = o.getOrElse("k", "16").toInt,
            seed = o.getOrElse("seed", "42").toLong,
            cIdCol = o.getOrElse("idCol", "vec_id"),
            vecCol = o.getOrElse("vecCol", "embedding"))
          case other => throw new Pipeline.ValidationException(
            s"reindex_index: unknown family '$other' (ivf | pq | ivfpq)")
        }
        ()
      })),
      // scheduled index maintenance: measure recall on the probe set,
      // reindex only when it breaches the floor, persist the audit
      // record — the job's frame is the corpus (re-rank/truth side),
      // queriesPath the driver-small probe set
      "reindex_if_drifted" -> (o => Sinks.Write("reindex_if_drifted", df => {
        val spark = df.sparkSession
        val dir = req(o, "dir")
        val audit = o.getOrElse("family", "ivf") match {
          case "ivf" => graft.llm.Similarity.reindexIvfIfDrifted(spark,
            dir, spark.read.parquet(req(o, "queriesPath")), df,
            k = o.getOrElse("k", "5").toInt,
            recallFloor = req(o, "recallFloor").toDouble,
            nProbe = o.getOrElse("nProbe", "4").toInt,
            nCentroids = o.getOrElse("nCentroids", "16").toInt,
            seed = o.getOrElse("seed", "42").toLong)
          case "ivfpq" => graft.llm.Similarity.reindexIvfPqIfDrifted(
            spark, dir, spark.read.parquet(req(o, "queriesPath")), df,
            k = o.getOrElse("k", "5").toInt,
            recallFloor = req(o, "recallFloor").toDouble,
            nProbe = o.getOrElse("nProbe", "4").toInt,
            shortlist = o.getOrElse("shortlist", "50").toInt,
            nCentroids = o.getOrElse("nCentroids", "16").toInt,
            m = o.getOrElse("m", "8").toInt,
            kCodes = o.getOrElse("kCodes", "16").toInt,
            seed = o.getOrElse("seed", "42").toLong)
          case other => throw new Pipeline.ValidationException(
            s"reindex_if_drifted: unknown family '$other' (ivf | ivfpq)")
        }
        audit.write.mode("append")
          .parquet(o.getOrElse("reportDir", s"$dir/maintenance"))
      })),
      // takedown compliance report: the job's frame IS the current
      // opt-out registry; the per-aspect report lands at reportDir
      // (default dir/compliance). failOnViolation=true raises on any
      // non-ok aspect — the post-takedown legal gate
      "retraction_compliance" -> (o => Sinks.Write("retraction_compliance", df => {
        val dir = req(o, "dir")
        val out = o.getOrElse("reportDir", s"$dir/compliance")
        graft.streaming.IndexIngest.retractionCompliance(
            df.sparkSession, dir, df, req(o, "idCol"))
          .write.mode("overwrite").parquet(out)
        if (o.getOrElse("failOnViolation", "false").toBoolean) {
          val bad = df.sparkSession.read.parquet(out)
            .where(!org.apache.spark.sql.functions.col("ok")).count()
          require(bad == 0L,
            s"retraction_compliance: $bad aspect(s) failed at $dir")
        }
        ()
      })),
      // retroactive decontamination: the job's frame IS the freshly
      // published benchmark; accepted docs sharing n-grams with it are
      // retracted from the curated-pack ledgers (forget=true default —
      // contaminated is not banned, see retractContaminated).
      "retract_contaminated" -> (o => Sinks.Write("retract_contaminated", df => {
        graft.streaming.IndexIngest.retractContaminated(
          df.sparkSession, req(o, "dir"),
          df.sparkSession.read.parquet(req(o, "docsPath")),
          req(o, "idCol"), req(o, "textCol"), benchmark = df,
          n = o.getOrElse("n", "8").toInt,
          minOverlaps = o.getOrElse("minOverlaps", "1").toInt,
          repack = o.getOrElse("repack", "false").toBoolean,
          budget = o.getOrElse("budget", "0").toLong,
          forget = o.getOrElse("forget", "true").toBoolean,
          tag = o.getOrElse("tag", ""))
        ()
      })))

  // ---- config-driven CONTINUOUS curation (`stream:` jobs) -----------------

  /** Streaming source kind -> (spark, options) => streaming frame.
    * `parquet_stream` watches a landing directory of parquet files
    * (schema from `schemaFrom` or a batch read of the path itself —
    * file streams require one up front); `warc_responses_stream` is
    * the continuous-crawl front end with the same status/contentType
    * gate options as the batch `warc_responses` source. */
  val streamSourceKinds: collection.mutable.Map[String, (SparkSession, Options) => DataFrame] =
    collection.mutable.Map(
      "parquet_stream" -> ((s, o) => {
        val path = req(o, "path")
        val schema = s.read.parquet(o.getOrElse("schemaFrom", path)).schema
        var reader = s.readStream.schema(schema)
        o.get("maxFilesPerTrigger").foreach(v =>
          reader = reader.option("maxFilesPerTrigger", v))
        reader.parquet(path)
      }),
      "warc_responses_stream" -> ((s, o) => {
        var df = Sources.readWarcResponsesStream(s, req(o, "path"))
        o.get("status").foreach(v => df = df.where(col("http_status") === v.toInt))
        o.get("contentType").foreach(v => df = df.where(col("content_type") === v))
        df
      }))

  /** One `stream:` job — the config form of the streamed-curation
    * chain ([[graft.streaming.IndexIngest.appendCuratedPackStream]]):
    * a streaming source, the per-micro-batch curation stages (any
    * transform kinds — they run on the batch frame inside
    * foreachBatch), and the ledger-deduped pack append's options.
    * `availableNow = true` declares epoch-drain intent: run with
    * [[runStreamOnce]] (drain what has landed, then stop — the mode
    * shard materialization and ledger compaction compose with). */
  final case class StreamSpec(name: String, source: StepConfig,
                              curate: Seq[StepConfig], pack: Options,
                              availableNow: Boolean,
                              index: Options = Map.empty,
                              search: Options = Map.empty,
                              pairs: Options = Map.empty,
                              mine: Options = Map.empty,
                              graph: Options = Map.empty)

  private val knownStreamKeys =
    Set("source", "curate", "pack", "index", "search", "pairs", "mine",
      "graph", "availableNow")

  /** Parse the `stream:` jobs of a config file (batch `parseYamlFile`
    * / `parse` skip them; the two surfaces share one file). Unknown
    * keys inside `stream:` always fail loudly — new surface, no
    * lenient legacy to honor. */
  def parseStreamsYamlFile(path: String): Seq[StreamSpec] =
    streamsFromTree(Yaml.parseFile(path))

  /** Extension-routed stream parse (the CLI's shape): YAML through the
    * !include-aware parser, anything else as JSON. */
  def parseStreamsFile(path: String): Seq[StreamSpec] =
    if (path.endsWith(".yaml") || path.endsWith(".yml"))
      parseStreamsYamlFile(path)
    else {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      streamsFromTree(deep(mapper.readValue(
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(path)), "UTF-8"),
        classOf[java.util.Map[String, Object]])))
    }

  private def streamsFromTree(root: Any): Seq[StreamSpec] = {
    val rootMap = root match {
      case m: Map[_, _] => m.asInstanceOf[Tree]
      case _ => throw new Pipeline.ValidationException("config: root must be a map")
    }
    rootMap.get("jobs").orElse(rootMap.get("migration"))
      .map(_.asInstanceOf[Vector[Any]]).getOrElse(Vector.empty)
      .collect { case j: Map[_, _] if j.asInstanceOf[Tree].contains("stream") =>
        streamFromTree(j.asInstanceOf[Tree]) }
  }

  private def streamFromTree(m: Tree): StreamSpec = {
    val st = m("stream") match {
      case t: Map[_, _] => t.asInstanceOf[Tree]
      case other => throw new Pipeline.ValidationException(
        s"config: 'stream' must be a map, got $other")
    }
    rejectUnknown(st, knownStreamKeys, "stream")
    val source = normalizeStep(
      st.getOrElse("source", throw new Pipeline.ValidationException(
        "config: stream job missing 'source'")).asInstanceOf[Tree],
      "stream.source")
    val curate = st.get("curate").map(_.asInstanceOf[Vector[Any]]
      .map(x => normalizeStep(x.asInstanceOf[Tree], "stream.curate")).toSeq)
      .getOrElse(Nil)
    def optMap(key: String): Options = st.get(key) match {
      case None => Map.empty
      case Some(t: Map[_, _]) => t.asInstanceOf[Tree].map { case (k, v) =>
        k -> String.valueOf(v) }
      case Some(other) => throw new Pipeline.ValidationException(
        s"config: stream '$key' must be a map, got $other")
    }
    val pack = optMap("pack")
    val index = optMap("index")
    val search = optMap("search")
    val prs = optMap("pairs")
    val mine = optMap("mine")
    val graph = optMap("graph")
    if (Seq(pack, index, search, prs, mine, graph).count(_.nonEmpty) != 1)
      throw new Pipeline.ValidationException(
        "config: stream job needs exactly one of 'pack', 'index', " +
          "'search', 'pairs', 'mine' or 'graph'")
    StreamSpec(
      name = String.valueOf(m.getOrElse("name",
        throw new Pipeline.ValidationException("config: job missing 'name'"))),
      source = source, curate = curate, pack = pack,
      availableNow = st.get("availableNow").exists(v =>
        String.valueOf(v).toBoolean),
      index = index, search = search, pairs = prs, mine = mine,
      graph = graph)
  }

  /** Start a `stream:` job: resolve the source and curation kinds,
    * hand them to the ledger-deduped sink — the curated-pack append
    * (`pack:`), a persisted ANN index append (`index:`, kinds
    * ivf/ivfpq/pq), or continuous index SERVING (`search:` — answers
    * to a result ledger). The returned query runs until stopped. Seed
    * the sink first (`seed_curated_pack` load kind, or the index
    * build kinds/APIs). */
  def runStream(spark: SparkSession, spec: StreamSpec):
      org.apache.spark.sql.streaming.StreamingQuery = {
    val src = streamSourceKinds.getOrElse(spec.source.kind,
      throw new Pipeline.ValidationException(
        s"config: unknown stream source kind '${spec.source.kind}' " +
          s"(known: ${streamSourceKinds.keys.toSeq.sorted.mkString(", ")})"))(
      spark, spec.source.options)
    val curate: DataFrame => DataFrame = df =>
      spec.curate.foldLeft(df) { (f, step) =>
        transformKinds.getOrElse(step.kind,
          throw new Pipeline.ValidationException(
            s"config: unknown transform kind '${step.kind}' in stream.curate"))(
          step.options)(f)
      }
    if (spec.pairs.nonEmpty) {
      // continuous PAIR ingest (the streamed LAION/DataComp crawl):
      // gates + three dedup layers into the accepted-pairs store;
      // the store is the only state (index-as-ledger)
      val px = spec.pairs
      return graft.streaming.IndexIngest.appendPairStream(src,
        req(px, "dir"),
        minWidth = px.getOrElse("minWidth", "8").toInt,
        minHeight = px.getOrElse("minHeight", "8").toInt,
        maxAspect = px.getOrElse("maxAspect", "3.0").toDouble,
        langs = px.getOrElse("langs", "en").split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq,
        minWords = px.getOrElse("minWords", "2").toInt,
        minAlign = px.getOrElse("minAlign", "0.5").toDouble,
        byCaption = px.getOrElse("byCaption", "true").toBoolean,
        curate = curate)
    }
    if (spec.mine.nonEmpty) {
      // continuous ALIGNMENT-DATA candidate mining: per-micro-batch
      // partition-pruned probes of a FROZEN persisted index append to
      // an idempotent candidates ledger; the corpus-level selection
      // tail (margin/mutual-argmax for bitext, adjacency + doc
      // exclusion for triplets) runs at epoch boundary via
      // finalizeBitextLedger / finalizeTripletsLedger — provably equal
      // to the one-shot indexed mine (spec-bound).
      val mx = spec.mine
      return mx.getOrElse("kind", "bitext") match {
        case "bitext" => graft.streaming.IndexIngest.mineBitextStream(
          src, req(mx, "tgtIndexDir"), req(mx, "outDir"),
          k = mx.getOrElse("k", "4").toInt,
          nProbe = mx.getOrElse("nProbe", "4").toInt,
          idCol = mx.getOrElse("idCol", "vec_id"),
          vecCol = mx.getOrElse("vecCol", "embedding"), curate = curate)
        case "triplets" => graft.streaming.IndexIngest.mineTripletsStream(
          src, req(mx, "indexDir"), req(mx, "outDir"),
          kCandidates = mx.getOrElse("kCandidates", "8").toInt,
          nProbe = mx.getOrElse("nProbe", "4").toInt,
          idCol = mx.getOrElse("idCol", "chunk_id"),
          vecCol = mx.getOrElse("vecCol", "embedding"), curate = curate)
        case other => throw new Pipeline.ValidationException(
          s"config: unknown stream mine kind '$other' (known: bitext, triplets)")
      }
    }
    if (spec.graph.nonEmpty) {
      // CONTINUOUS LINK-GRAPH MAINTENANCE: page events stream into the
      // idempotent transitions ledger (per-user cross-batch state, hits
      // keyed by the later event's id); the rank refresh runs at epoch
      // boundary over the ledger via the BATCH kinds — a `parquet`
      // extract of the ledger through `pagerank`/`host_prior` in a
      // declared job, exactly the classifier_train/filter two-phase
      // handoff shape. Curation kinds (map-only) run on the stream
      // BEFORE the stateful operator.
      val gx = spec.graph
      val ss = src.sparkSession
      import ss.implicits._
      val pageCol = gx.get("pageCol").map(ColumnNs.q).getOrElse(
        get_json_object(ColumnNs.q(gx.getOrElse("propsCol", "props")),
          "$." + gx.getOrElse("pageProp", "k")).cast("long"))
      val pe = curate(src).select(
          ColumnNs.q(gx.getOrElse("userCol", "user_id")).cast("long")
            .as("user_id"),
          ColumnNs.q(gx.getOrElse("tieCol", "event_id")).cast("long")
            .as("event_id"),
          ColumnNs.q(gx.getOrElse("tsCol", "ts")).cast("timestamp")
            .as("ts"),
          pageCol.as("page"))
        .as[graft.streaming.EventsStream.PageEvent]
      return graft.streaming.EventsStream.transitionsLedgerSink(
        graft.streaming.EventsStream.transitionsStream(pe,
          gapMinutes = gx.getOrElse("gapMinutes", "30").toInt,
          stateTtl = gx.getOrElse("stateTtl", "2 hours")),
        req(gx, "outDir"),
        bucketSize = gx.getOrElse("ledgerBucketSize", "10000000").toLong)
    }
    if (spec.search.nonEmpty) {
      // continuous SERVING: per-micro-batch partition-pruned probe of
      // a persisted index over the job's query stream, answers to
      // an on-disk result ledger (answer-exactly-once by the ledger's
      // own query ids). Curation kinds still run per batch — query
      // normalization/filtering composes the same way ingest does.
      // kind: ivf (default) = vector probes; bm25 = lexical battery
      // over a build_postings directory.
      val sx = spec.search
      return sx.getOrElse("kind", "ivf") match {
        case "ivf" => graft.streaming.IndexIngest.searchIvfStream(src,
          req(sx, "indexDir"), req(sx, "outDir"),
          k = sx.getOrElse("k", "5").toInt,
          nProbe = sx.getOrElse("nProbe", "2").toInt,
          qIdCol = sx.getOrElse("idCol", "vec_id"),
          vecCol = sx.getOrElse("vecCol", "embedding"),
          curate = curate)
        case "bm25" => graft.streaming.IndexIngest.bm25SearchStream(src,
          req(sx, "indexDir"), req(sx, "outDir"),
          k = sx.getOrElse("k", "5").toInt,
          qIdCol = sx.getOrElse("idCol", "qid"),
          qTextCol = sx.getOrElse("textCol", "text"),
          curate = curate)
        // continuous hybrid triage: both persisted indexes per batch,
        // reciprocal-rank fused, answer-exactly-once ledger. family
        // picks the vector side: ivf (default) or ivfpq (compressed
        // residual codes + exact re-rank from rerankPath)
        case "hybrid" => graft.streaming.IndexIngest.hybridSearchStream(
          src, req(sx, "bm25IndexDir"), req(sx, "annIndexDir"),
          req(sx, "outDir"),
          k = sx.getOrElse("k", "5").toInt,
          kPerSignal = sx.getOrElse("kPerSignal", "10").toInt,
          k0 = sx.getOrElse("k0", "60").toInt,
          nProbe = sx.getOrElse("nProbe", "4").toInt,
          qIdCol = sx.getOrElse("idCol", "qid"),
          qTextCol = sx.getOrElse("textCol", "text"),
          qVecCol = sx.getOrElse("vecCol", "embedding"),
          curate = curate,
          family = sx.getOrElse("family", "ivf"),
          rerankPath = sx.get("rerankPath"),
          shortlist = sx.getOrElse("shortlist", "50").toInt,
          cIdCol = sx.getOrElse("cIdCol", "vec_id"),
          cVecCol = sx.getOrElse("cVecCol", "embedding"))
        case other => throw new Pipeline.ValidationException(
          s"config: unknown stream search kind '$other' " +
            "(known: ivf, bm25, hybrid)")
      }
    }
    if (spec.index.nonEmpty) {
      // continuous VECTOR-STORE ingest: curation stages still run per
      // micro-batch inside foreachBatch; the sink is a persisted ANN
      // index (build it first — buildIvfIndex/buildPqIndex/
      // buildIvfPqIndex, the "ledger present before the stream starts"
      // convention). semanticDedupThreshold (ivf only) refuses
      // already-indexed semantic twins.
      val ix = spec.index
      val dir = req(ix, "dir")
      val idc = ix.getOrElse("idCol", "vec_id")
      val vc = ix.getOrElse("vecCol", "embedding")
      return ix.getOrElse("kind", "ivf") match {
        case "ivf" => graft.streaming.IndexIngest.appendIvfIndexStream(
          src, dir, idc, vc,
          semanticDedupThreshold =
            ix.get("semanticDedupThreshold").map(_.toDouble),
          nProbe = ix.getOrElse("nProbe", "2").toInt, curate = curate)
        case "pq" => graft.streaming.IndexIngest.appendPqIndexStream(
          src, dir, idc, vc, curate = curate)
        case "ivfpq" => graft.streaming.IndexIngest.appendIvfPqIndexStream(
          src, dir, idc, vc, curate = curate)
        case other => throw new Pipeline.ValidationException(
          s"config: unknown stream index kind '$other' (known: ivf, ivfpq, pq)")
      }
    }
    val p = spec.pack
    graft.streaming.IndexIngest.appendCuratedPackStream(src,
      req(p, "dir"), req(p, "idCol"), req(p, "textCol"),
      req(p, "budget").toLong, curate = curate,
      nearDupThreshold = p.get("nearDupThreshold").map(_.toDouble),
      k = p.getOrElse("k", "64").toInt,
      bands = p.getOrElse("bands", "16").toInt,
      maxBucket = p.getOrElse("maxBucket", "1000").toInt)
  }

  /** Epoch-drain execution of a `stream:` job: start, process
    * everything the source has landed, stop. Idempotent across
    * invocations BY THE LEDGER (no checkpoint dir needed: re-read
    * files replay into the assignment anti-join and drop), so "run
    * at each epoch boundary" is safe scheduling. */
  def runStreamOnce(spark: SparkSession, spec: StreamSpec): Unit = {
    val q = runStream(spark, spec)
    try q.processAllAvailable() finally q.stop()
  }

  private def req(o: Options, k: String): String =
    o.getOrElse(k, throw new Pipeline.ValidationException(s"missing option '$k'"))

  /** Parse the `phases` option shared by the phase-schedule kinds:
    * `name=budget:domain=w,domain=w;name=budget:…` →
    * [[graft.llm.Mixing.MixPhase]] list. One definition so
    * `mix_phase_schedule` and `phased_shards` cannot drift. */
  private def parsePhases(o: Options, kind: String)
      : Seq[graft.llm.Mixing.MixPhase] = {
    def bad(entry: String, why: String) =
      throw new Pipeline.ValidationException(
        s"$kind: bad phases entry '$entry' ($why; " +
          "expected name=budget:domain=w,domain=w)")
    val phases = req(o, "phases").split(";").map(_.trim)
      .filter(_.nonEmpty).map { ph =>
        ph.split(":", 2) match {
          case Array(head, tgts) => head.split("=", 2) match {
            case Array(n, b) if n.trim.nonEmpty && b.trim.matches("\\d+") =>
              val targets = tgts.split(",").map { kv =>
                kv.split("=", 2) match {
                  case Array(dm, w) if dm.trim.nonEmpty &&
                      w.trim.matches("\\d*\\.?\\d+") =>
                    dm.trim -> w.trim.toDouble
                  case _ => bad(ph, s"bad weight '$kv'")
                }
              }.toMap
              graft.llm.Mixing.MixPhase(n.trim, b.trim.toLong, targets)
            case _ => bad(ph, "bad name=budget head")
          }
          case _ => bad(ph, "missing ':' separator")
        }
      }.toSeq
    if (phases.isEmpty)
      throw new Pipeline.ValidationException(s"$kind: empty phases")
    phases
  }

  /** Shared packing-kind token expression: `tokensCol` names an
    * existing array<string> column; absent → whitespace tokens of
    * `textCol`, NULL-SAFE (a null text is zero tokens, not a null
    * array poisoning downstream size()/fold arithmetic). One
    * definition so the three packing kinds cannot drift. */
  private def wsToks(o: Options): Column =
    o.get("tokensCol").map(c => ColumnNs.q(c)).getOrElse(
      filter(split(trim(coalesce(ColumnNs.q(req(o, "textCol")), lit(""))),
        "\\s+"), w => w =!= ""))
  /** "prefix" option: absent -> default "legacy." (the reference's
    * configurable default, README.md:67); "" -> no normalization. */
  private def prefix(o: Options): Option[String] = o.get("prefix") match {
    case None      => Some("legacy.")
    case Some("")  => None
    case Some(p)   => Some(p)
  }
  private def dir(o: Options): String = o.getOrElse("dir", ".")
  private def file(o: Options): String = req(o, "file")
  private def overwrite(o: Options): Boolean = o.getOrElse("overwrite", "true").toBoolean
  private def scoped(df: DataFrame, o: Options)(w: DataFrame => Unit): Unit =
    o.get("prefixes") match {
      case Some(ps) => Sinks.prefixScoped(df, ps.split(",").toSeq,
        o.getOrElse("strip", "true").toBoolean)(w)
      case None => w(df)
    }

  /** `pipeline: FQCN` aliases (the reference's reflective transform
    * extension point, `Transform/Orchestrator.php:103-117` — e.g.
    * `PluginNamespace\TransformationPipelines\WPPostsPipeline`): the
    * class simple name maps onto a registered transform kind. Open so
    * plugins can register their own. */
  val pipelineAliases: collection.mutable.Map[String, String] =
    collection.mutable.Map(
      "WPPostsPipeline" -> "post_pipeline",
      "WPTermsPipeline" -> "term_pipeline",
      "WPUsersPipeline" -> "user_pipeline",
      "WPMediaPipeline" -> "media_pipeline")

  /** Parse a JSON config document into JobSpecs (throws
    * ValidationException on unknown kinds / missing fields — the
    * `wp etl config validate` behavior). `strict = true` is the
    * `--strict` mode (`ConfigCommand.php:58-67`): additionally reject
    * unknown root- and job-level keys (a typo'd `dependson:` must not
    * silently drop a dependency) and file-writing load steps with no
    * destination (a missing `file:`/`path:` otherwise only surfaces at
    * write time). */
  def parse(json: String, strict: Boolean = false): Seq[Pipeline.JobSpec] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    fromTree(deep(mapper.readValue(json, classOf[java.util.Map[String, Object]])), strict)
  }

  def parseFile(path: String, strict: Boolean = false): Seq[Pipeline.JobSpec] =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"), strict)

  /** Parse a reference-shaped YAML config (with `!include` composition)
    * into JobSpecs. Accepts BOTH this library's `jobs:` schema and the
    * reference's `migration:` schema (`README.md:35-94`): per-step
    * `adapter:`/`loader:`/`pipeline:` resolve to kinds, `args:` children
    * become plain options, `destination: {path, file}` becomes
    * `dir`/`file`, a load-side `prefix:` becomes `prefixes`, and
    * `JSON_PRETTY_PRINT` in `options.flags` becomes `pretty`. */
  def parseYamlFile(path: String, strict: Boolean = false): Seq[Pipeline.JobSpec] =
    fromTree(Yaml.parseFile(path), strict)

  /** Normalize a Jackson tree to the Scala shapes [[fromTree]] walks
    * (insertion order preserved — Jackson uses LinkedHashMap). */
  private def deep(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      scala.collection.immutable.VectorMap(
        m.asScala.toSeq.map { case (k, x) => String.valueOf(k) -> deep(x) }: _*)
    case l: java.util.List[_] => l.asScala.toVector.map(deep)
    case x => x
  }

  private type Tree = Map[String, Any]

  // strict-mode known-key sets: the union of this library's schema and
  // the reference's (README.md:35-94 — version/slug/ledger/sources/...)
  private val knownRootKeys = Set("jobs", "migration", "version", "name",
    "slug", "description", "ledger", "sources", "secrets", "settings")
  private val knownJobKeys = Set("name", "dependsOn", "skip", "description",
    "ledger", "extract", "transform", "load", "cache")
  /** Load kinds that write files and the destination option(s) strict
    * mode requires them to carry up front (lenient mode defers the
    * missing-option failure to write time). */
  private val loadRequiredDest: Map[String, Seq[String]] = Map(
    "json" -> Seq("file"), "csv" -> Seq("file"), "json_dir" -> Seq("path"),
    "parquet_dir" -> Seq("path"),
    "shards" -> Seq("path"), "ledger" -> Seq("dir", "name"),
    "partitioned" -> Seq("path"), "classifier_train" -> Seq("path"),
    "build_postings" -> Seq("path"), "append_postings" -> Seq("path"),
    "rebuild_postings_if_stale" -> Seq("path"),
    "compact_postings" -> Seq("path"),
    "vacuum_postings" -> Seq("path"),
    "compact_vector_index" -> Seq("dir"),
    "compact_pack_ledger" -> Seq("dir"),
    "compact_ledger_dir" -> Seq("dir"),
    "training_shards" -> Seq("dir"), "pq_index" -> Seq("dir"),
    "phased_shards" -> Seq("dir"),
    "ivfpq_index" -> Seq("dir"), "excess_weights" -> Seq("dir"),
    "ce_prices" -> Seq("dir"),
    "mix_report" -> Seq("reportDir"),
    "materialize_shards" -> Seq("dir", "assignmentDir"),
    "seed_curated_pack" -> Seq("dir"),
    "retract_pack" -> Seq("dir"),
    "retract_vector_index" -> Seq("dir", "idCol"),
    "retract_postings" -> Seq("dir", "idCol"),
    "vacuum_rank_trace" -> Seq("dir"),
    "retract_contaminated" -> Seq("dir", "docsPath"),
    "refresh_shards" -> Seq("dir", "ledgerDir"),
    "unretract_pack" -> Seq("dir"),
    "audit_shards" -> Seq("dir"),
    "reindex_index" -> Seq("dir"),
    "reindex_if_drifted" -> Seq("dir", "queriesPath"),
    "retraction_compliance" -> Seq("dir"))

  private def rejectUnknown(m: Tree, known: Set[String], what: String): Unit = {
    val unknown = m.keys.filterNot(known)
    if (unknown.nonEmpty)
      throw new Pipeline.ValidationException(
        s"config (strict): unknown $what key(s): ${unknown.mkString(", ")} " +
          s"(known: ${known.toSeq.sorted.mkString(", ")})")
  }

  private def fromTree(root: Any, strict: Boolean = false): Seq[Pipeline.JobSpec] = {
    val rootMap = root match {
      case m: Map[_, _] => m.asInstanceOf[Tree]
      case _ => throw new Pipeline.ValidationException("config: root must be a map")
    }
    if (strict) rejectUnknown(rootMap, knownRootKeys, "root")
    val jobs = rootMap.get("jobs").orElse(rootMap.get("migration")).getOrElse(
        throw new Pipeline.ValidationException("config: missing 'jobs' (or 'migration')"))
      .asInstanceOf[Vector[Any]]
    jobs.map {
      case j: Map[_, _] => j.asInstanceOf[Tree]
      case other => throw new Pipeline.ValidationException(
        s"config: job entry must be a map, got $other")
    }
      // `stream:` jobs are the continuous surface — parsed by
      // [[parseStreamsYamlFile]]; the batch planner skips them so one
      // file can declare the seed job AND its continuous twin
      .filterNot(_.contains("stream"))
      .map(jobFromTree(_, strict))
  }

  private def jobFromTree(m: Tree, strict: Boolean = false): Pipeline.JobSpec = {
    if (strict) {
      rejectUnknown(m, knownJobKeys, "job")
      m.get("load").foreach(_.asInstanceOf[Vector[Any]].foreach { s =>
        val step = normalizeStep(s.asInstanceOf[Tree], "load")
        loadRequiredDest.get(step.kind).foreach { needed =>
          val missing = needed.filterNot(step.options.contains)
          if (missing.nonEmpty)
            throw new Pipeline.ValidationException(
              s"config (strict): load step '${step.kind}' missing destination " +
                s"option(s): ${missing.mkString(", ")}")
        }
      })
    }
    def steps(key: String): Seq[StepConfig] =
      m.get(key).map(_.asInstanceOf[Vector[Any]]
        .map(s => normalizeStep(s.asInstanceOf[Tree], key))).getOrElse(Nil)
    def resolve[T](kind: String, reg: collection.Map[String, Options => T],
                   what: String, opts: Options): T =
      reg.getOrElse(kind, throw new Pipeline.ValidationException(
        s"config: unknown $what kind '$kind' (known: ${reg.keys.toSeq.sorted.mkString(", ")})"))(opts)
    // `cache: <dir>` (or `cache: {dir: ...}`) turns on resumable
    // fingerprint-keyed stage materialization (StageCache): each
    // transform stage's output persists under the dir, keyed by the
    // md5 chain of source + stage configs + input-file stats, so a
    // re-run recomputes only from the first edited stage down
    val cacheDir: Option[String] = m.get("cache").flatMap {
      case s: String => Some(s)
      case mm: Map[_, _] => mm.asInstanceOf[Tree].get("dir").map(String.valueOf)
      case other => throw new Pipeline.ValidationException(
        s"config: 'cache' must be a dir string or {dir: ...}, got $other")
    }
    val extractSteps = steps("extract")
    val transformSteps = steps("transform")
    val baseStages = transformSteps.map(s =>
      resolve(s.kind, transformKinds, "transform", s.options))
    Pipeline.JobSpec(
      name = String.valueOf(m.getOrElse("name",
        throw new Pipeline.ValidationException("config: job missing 'name'"))),
      dependsOn = m.get("dependsOn")
        .map(_.asInstanceOf[Vector[Any]].map(String.valueOf).toSeq).getOrElse(Nil),
      skip = m.get("skip").exists(v => String.valueOf(v).toBoolean),
      extract = extractSteps.map(s => resolve(s.kind, sourceKinds, "source", s.options)),
      transform = cacheDir match {
        case Some(cd) => StageCache.wrap(cd, extractSteps, transformSteps, baseStages)
        case None => baseStages
      },
      load = steps("load").map(s => resolve(s.kind, loadKinds, "load", s.options)))
  }

  // NOT dropping "name": some kinds consume it as an option (the ledger
  // writer's ledger name); a step label flowing into options is harmless
  private val stepMetaKeys = Set("kind", "adapter", "loader", "pipeline")

  private def normalizeStep(m: Tree, phase: String): StepConfig = {
    val kind = m.get("kind").map(String.valueOf)
      .orElse(m.get("adapter").map(String.valueOf))
      .orElse(m.get("loader").map(v => String.valueOf(v).toLowerCase))
      .orElse(m.get("pipeline").map { v =>
        val simple = String.valueOf(v).split("[\\\\.]").last
        pipelineAliases.getOrElse(simple, simple)
      })
      .getOrElse(throw new Pipeline.ValidationException(
        s"config: step in '$phase' missing 'kind' (or adapter/loader/pipeline)"))
    val flat = collection.mutable.LinkedHashMap.empty[String, String]
    def walk(prefix: String, v: Any): Unit = v match {
      case mm: Map[_, _] => mm.asInstanceOf[Tree].foreach { case (k, x) =>
        walk(if (prefix.isEmpty) k else s"$prefix.$k", x) }
      case l: Vector[_] => flat(prefix) = l.map(String.valueOf).mkString(",")
      case null => ()
      case x => flat(prefix) = String.valueOf(x)
    }
    m.foreach { case (k, v) if !stepMetaKeys(k) => walk(k, v); case _ => () }
    // reference-schema remaps onto this library's option names: `args:`
    // and `options:` children become plain options, `destination:`
    // becomes dir/file
    val remapped = flat.map {
      case (k, v) if k.startsWith("args.") => k.stripPrefix("args.") -> v
      case (k, v) if k.startsWith("options.") => k.stripPrefix("options.") -> v
      case ("destination.path", v) => "dir" -> v
      case ("destination.file", v) => "file" -> v
      case kv => kv
    }
    var opts = remapped.toMap
    if (phase == "load" && opts.contains("prefix") && !opts.contains("prefixes"))
      opts += "prefixes" -> opts("prefix")
    if (opts.get("flags").exists(_.contains("JSON_PRETTY_PRINT")))
      opts += "pretty" -> "true"
    StepConfig(kind, opts)
  }
}
