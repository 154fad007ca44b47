package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{BloomBuild, BloomContains, CmsBuild, HtmlExtract, CmsEstimate, CosineSim, HammingDist, HistQuantile, HistSketch, HllDistinct, HllEstimate, HllSketch, LnPinned, LshEuclidean, LshJaccard, LshMin, MinFingerprint, ShingleHashes, SimHash64, SketchMerge, TopKByScore, UnicodeNorm, WinnowFingerprint}

/** Registration of the five LSH SQL functions, the analog of the reference's
  * extension entry point (/root/reference/src/lib.rs:40-53). After
  * `LshFunctions.register(spark)` (or installing [[GraftExtensions]] via
  * `spark.sql.extensions`), the functions are usable from SQL strings and —
  * through [[graft.functions]] — from the DataFrame API.
  */
object LshFunctions {

  type Builder = Seq[Expression] => Expression

  val all: Seq[(String, Builder)] = Seq(
    "lsh_min" -> ((args: Seq[Expression]) => LshMin(args, is32 = false)),
    "lsh_min32" -> ((args: Seq[Expression]) => LshMin(args, is32 = true)),
    "lsh_euclidean" -> ((args: Seq[Expression]) => LshEuclidean(args, is32 = false)),
    "lsh_euclidean32" -> ((args: Seq[Expression]) => LshEuclidean(args, is32 = true)),
    "lsh_jaccard" -> ((args: Seq[Expression]) => {
      require(args.length == 3, "lsh_jaccard expects 3 arguments")
      LshJaccard(args(0), args(1), args(2))
    }),
    // pipeline operators beyond the reference surface
    "simhash64" -> ((args: Seq[Expression]) => {
      require(args.length == 1, "simhash64 expects 1 argument")
      SimHash64(args.head)
    }),
    "hamming_dist" -> ((args: Seq[Expression]) => {
      require(args.length == 2, "hamming_dist expects 2 arguments")
      HammingDist(args(0), args(1))
    }),
    "min_fingerprint" -> ((args: Seq[Expression]) => {
      require(args.length == 2, "min_fingerprint expects 2 arguments")
      MinFingerprint(args(0), args(1))
    }),
    "winnow_fingerprint" -> ((args: Seq[Expression]) => {
      require(args.length == 3, "winnow_fingerprint expects 3 arguments")
      WinnowFingerprint(args(0), args(1), args(2))
    }),
    "shingle_hashes" -> ((args: Seq[Expression]) => {
      require(args.length == 2, "shingle_hashes expects 2 arguments")
      ShingleHashes(args(0), args(1))
    }),
    // aggregates: the analyzer wraps a bare AggregateFunction in an
    // AggregateExpression, so the same builder shape works
    "hll_distinct" -> ((args: Seq[Expression]) => {
      require(args.length == 2, "hll_distinct expects 2 arguments")
      HllDistinct(args(0), args(1))
    }),
    "bloom_build" -> ((args: Seq[Expression]) => {
      require(args.length == 3, "bloom_build expects 3 arguments")
      BloomBuild(args(0), args(1), args(2))
    }),
    "bloom_contains" -> ((args: Seq[Expression]) => {
      require(args.length == 2, "bloom_contains expects 2 arguments")
      BloomContains(args(0), args(1))
    }),
    "cms_build" -> ((args: Seq[Expression]) => {
      require(args.length == 3, "cms_build expects 3 arguments")
      CmsBuild(args(0), args(1), args(2))
    }),
    "cms_estimate" -> ((args: Seq[Expression]) => {
      require(args.length == 2, "cms_estimate expects 2 arguments")
      CmsEstimate(args(0), args(1))
    }),
    "hll_sketch" -> ((args: Seq[Expression]) => {
      require(args.length == 2, "hll_sketch expects 2 arguments")
      HllSketch(args(0), args(1))
    }),
    "sketch_merge" -> ((args: Seq[Expression]) => {
      require(args.length == 1, "sketch_merge expects 1 argument")
      SketchMerge(args(0))
    }),
    "hll_estimate" -> ((args: Seq[Expression]) => {
      require(args.length == 1, "hll_estimate expects 1 argument")
      HllEstimate(args(0))
    }),
    "hist_sketch" -> ((args: Seq[Expression]) => {
      require(args.length == 2, "hist_sketch expects 2 arguments")
      HistSketch(args(0), args(1))
    }),
    "hist_quantile" -> ((args: Seq[Expression]) => {
      require(args.length == 2, "hist_quantile expects 2 arguments")
      HistQuantile(args(0), args(1))
    }),
    "ln_pinned" -> ((args: Seq[Expression]) => {
      require(args.length == 1, "ln_pinned expects 1 argument")
      LnPinned(args(0))
    }),
    "cosine_sim" -> ((args: Seq[Expression]) => {
      require(args.length == 2, "cosine_sim expects 2 arguments")
      CosineSim(args(0), args(1))
    }),
    "topk_by" -> ((args: Seq[Expression]) => {
      require(args.length == 3, "topk_by expects 3 arguments")
      TopKByScore(args(0), args(1), args(2))
    }),
    "html_extract" -> ((args: Seq[Expression]) => {
      require(args.length == 1, "html_extract expects 1 argument")
      HtmlExtract(args(0))
    }),
    "levenshtein_cp" -> ((args: Seq[Expression]) => {
      require(args.length == 2, "levenshtein_cp expects 2 arguments")
      org.apache.spark.sql.graft.LevenshteinCp(args(0), args(1))
    }),
    "image_dhash" -> ((args: Seq[Expression]) => {
      require(args.length == 1, "image_dhash expects 1 argument")
      org.apache.spark.sql.graft.ImageHash64(args(0), "dhash")
    }),
    "image_ahash" -> ((args: Seq[Expression]) => {
      require(args.length == 1, "image_ahash expects 1 argument")
      org.apache.spark.sql.graft.ImageHash64(args(0), "ahash")
    }),
    "image_resize" -> ((args: Seq[Expression]) => {
      require(args.length == 2, "image_resize expects 2 arguments (bytes, maxDim)")
      val maxDim = args(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"image_resize maxDim must be an integer literal, got $other")
      }
      org.apache.spark.sql.graft.ImageResizeBox(args(0), maxDim)
    }),
    "audio_fp" -> ((args: Seq[Expression]) => {
      require(args.length == 1, "audio_fp expects 1 argument")
      org.apache.spark.sql.graft.AudioFp64(args(0))
    }),
    "unicode_norm" -> ((args: Seq[Expression]) => {
      require(args.length == 1 || args.length == 2,
        "unicode_norm expects 1 or 2 arguments (text[, form])")
      val form =
        if (args.length == 1) "NFC"
        else {
          // the form picks a construction-time constant (no per-row
          // dispatch), so it must be foldable — same rule as the LSH
          // params, evaluated here at resolution time
          require(args(1).foldable, "unicode_norm form must be a constant string")
          String.valueOf(args(1).eval(null))
        }
      UnicodeNorm(args(0), form)
    }))

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo("graft.sql.LshFunctions", null, name)

  /** Install into the session's function registry, and the
    * [[org.apache.spark.sql.graft.BlockedSelfJoinStrategy]] planner strategy
    * into `experimental.extraStrategies` (the runtime counterpart of
    * injectPlannerStrategy for sessions built without the extensions conf).
    * Idempotent. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    all.foreach { case (name, builder) =>
      // skip names already present (e.g. the session loaded GraftExtensions):
      // re-registering triggers a "replaced a previously registered function"
      // WARN per function per session, flooding captured output
      if (!registry.functionExists(FunctionIdentifier(name)))
        registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
    ensurePlannerStrategy(spark)
    val orRule = org.apache.spark.sql.graft.OrEquiJoinExpansion
    if (!spark.experimental.extraOptimizations.contains(orRule))
      spark.experimental.extraOptimizations = spark.experimental.extraOptimizations :+ orRule
  }

  /** Idempotent [[org.apache.spark.sql.graft.BlockedSelfJoinStrategy]]
    * installation — the single registration idiom shared by [[register]]
    * and the operators that need the strategy from a bare session
    * ([[graft.api.BandedLsh.bandedSelfJoinPairs]]). */
  def ensurePlannerStrategy(spark: SparkSession): Unit = {
    val strategy = org.apache.spark.sql.graft.BlockedSelfJoinStrategy
    if (!spark.experimental.extraStrategies.contains(strategy))
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ strategy
  }
}

/** `spark.sql.extensions=graft.sql.GraftExtensions` — injected-function
  * variant of [[LshFunctions.register]] for cluster-wide installation.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    LshFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.sql.LshFunctions", null, name), builder))
    }
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graft.BlockedSelfJoinStrategy)
    ext.injectOptimizerRule(_ => org.apache.spark.sql.graft.OrEquiJoinExpansion)
  }
}
