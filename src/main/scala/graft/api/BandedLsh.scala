package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Scale-out helpers for the reference's banded LSH blocking-join pattern
  * (/root/reference/README.md:133-164). The README idiom is one join per
  * seed + UNION; at scale the right shape is: posexplode the band array once,
  * shuffle once on (band, hash), and join — one shuffle covers all bands
  * (SURVEY.md §7.4).
  */
object BandedLsh {

  /** Plan (bandCount, bandSize) for a target recall at a Jaccard
    * threshold — the knob the reference's README leaves to hand-tuning
    * (README.md:133-141 shows one fixed 8×3 example). Banded MinHash
    * admits a pair of similarity s with probability 1 − (1 − s^r)^b
    * (the standard S-curve, e.g. Leskovec/Rajaraman/Ullman ch. 3); given
    * a threshold and required recall at that threshold, this returns the
    * LARGEST row count r (steepest curve → fewest sub-threshold false
    * candidates, i.e. least verification work) whose required band count
    * b = ceil(ln(1−recall) / ln(1−threshold^r)) fits `maxBands`, plus
    * that b. Cost model: bands multiply the blocking join's exploded-row
    * volume linearly, while rows only lengthen each signature — so cap
    * `maxBands` by shuffle budget and let r absorb the precision.
    *
    * Returns (bandCount, bandSize). Always satisfiable: r=1 needs
    * b = ln(1−recall)/ln(1−threshold) which is finite for threshold>0;
    * if even that exceeds maxBands, this throws rather than silently
    * under-recalling. */
  def planBands(threshold: Double, targetRecall: Double,
                maxBands: Int = 64, maxRows: Int = 16): (Int, Int) = {
    require(threshold > 0.0 && threshold < 1.0, s"threshold in (0,1), got $threshold")
    require(targetRecall > 0.0 && targetRecall < 1.0, s"recall in (0,1), got $targetRecall")
    require(maxBands >= 1 && maxRows >= 1, "maxBands and maxRows must be >= 1")
    def bandsFor(r: Int): Int = {
      val hit = math.pow(threshold, r) // P(one band matches the pair)
      val missOne = 1.0 - hit
      if (missOne <= 0.0) 1 // threshold^r == 1 numerically: one band suffices
      // hit below double epsilon: missOne rounds to exactly 1.0 and
      // log(1.0) = 0 would make the division return -Infinity → a bogus
      // 1-band "plan" that under-recalls catastrophically. No finite band
      // count reaches the target here.
      else if (missOne >= 1.0) Int.MaxValue
      else math.ceil(math.log1p(-targetRecall) / math.log(missOne)).toInt.max(1)
    }
    (maxRows to 1 by -1).iterator
      .map(r => (bandsFor(r), r))
      .find(_._1 <= maxBands)
      .getOrElse(throw new IllegalArgumentException(
        s"recall $targetRecall at threshold $threshold needs ${bandsFor(1)} " +
          s"bands even at bandSize=1 — raise maxBands or lower the target"))
  }

  /** The S-curve itself: P(pair of similarity `s` becomes a candidate)
    * under (bandCount, bandSize) banding. Exposed for planning/reporting
    * (e.g. expected false-candidate rate at a sub-threshold similarity). */
  def candidateProbability(s: Double, bandCount: Int, bandSize: Int): Double =
    1.0 - math.pow(1.0 - math.pow(s, bandSize), bandCount)

  /** Explode `lsh_min(textCol, ...)` into (band, hash) rows keyed by `idCol`.
    * Rows whose text is shorter than `ngramWidth` hash identically everywhere
    * (empty shingle set, SURVEY.md §2.2.4) and are dropped up front — they
    * would otherwise form one catastrophic bucket. */
  def bandedRows(df: DataFrame, idCol: String, textCol: String,
                 ngramWidth: Int, bandCount: Int, bandSize: Int, seed: Long): DataFrame = {
    // Spread the CPU-bound minhash kernel across the cluster BEFORE hashing:
    // banding parallelism must not be capped by the input file layout (a
    // single-row-group parquet file scans as ONE task, serializing the whole
    // shingle+hash pass — measured 1.0s single-threaded at sf0.1 inside a
    // broadcast build). The id-hash shuffle moves each doc once and is
    // dwarfed by the (band, hash) shuffle/broadcast that always follows.
    val n = SparkEnv.shufflePartitions(df.sparkSession)
    df.filter(length(col(textCol)) >= ngramWidth)
      .repartition(n, col(idCol))
      .select(col(idCol), col(textCol),
        posexplode(graft.functions.lsh_min(col(textCol), ngramWidth, bandCount, bandSize, seed)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
  }

  /** Distinct candidate id pairs (id_a < id_b) that collide in at least one
    * band — the blocking stage of a self near-dup join. Only ids flow through
    * the band join and the distinct: shuffling and deduplicating (id, id)
    * longs is cheap where dragging the full documents through would move the
    * whole corpus per band; texts are re-attached afterwards by two id joins. */
  def candidatePairs(df: DataFrame, idCol: String, textCol: String,
                     ngramWidth: Int, bandCount: Int, bandSize: Int, seed: Long): DataFrame = {
    // bucket repartition → the self-join reads ONE ReusedExchange: the
    // banding pass (lsh_min) runs once per document, not once per side.
    // The SHUFFLE_HASH hint is load-bearing for that: when the banded rows
    // estimate under the broadcast threshold the planner would otherwise
    // broadcast one side — which REPLACES that side's exchange with a
    // broadcast build, so the CPU-bound minhash banding runs twice (once
    // per side) and the build serializes on the driver (measured at sf0.1:
    // a second full lsh_min pass + a 6.7 s single-task build). A shuffled
    // hash join keeps both sides on the one exchange and builds per
    // partition.
    val banded = bandedRows(df, idCol, textCol, ngramWidth, bandCount, bandSize, seed)
      .select(col(idCol), col("band"), col("band_hash"))
      .repartition(col("band"), col("band_hash"))
    val a = banded.select(col(idCol).as("id_a"), col("band"), col("band_hash"))
    val b = banded.select(col(idCol).as("id_b"), col("band"), col("band_hash"))
    val n = SparkEnv.shufflePartitions(df.sparkSession)
    val idPairs = a.hint("shuffle_hash").join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      // strict-width dedup: AQE sizes shuffles on BYTES, and a candidate
      // id-pair stream is tiny bytes but quadratic-in-bucket CPU — the
      // ENSURE_REQUIREMENTS exchange under distinct() was coalesced to ONE
      // task (6.7 s serialized at sf0.1, the lsh_blocking_join pathology).
      // REPARTITION_BY_NUM on the distinct keys is AQE-unresizable and
      // already satisfies the aggregate's distribution, so the dedup runs
      // at full width with no extra exchange.
      .repartition(n, col("id_a"), col("id_b"))
      .distinct()
    idPairs
      .join(df.select(col(idCol).as("id_a"), col(textCol).as("text_a")), "id_a")
      .join(df.select(col(idCol).as("id_b"), col(textCol).as("text_b")), "id_b")
      .select("id_a", "id_b", "text_a", "text_b")
  }

  /** Full near-dup pair mining: banded blocking + exact-Jaccard verification.
    * Returns (id_a, id_b, sim) with sim > threshold.
    *
    * Uses the relational band join with verification INSIDE the band join —
    * `lsh_jaccard` runs on each band collision as it streams out of the
    * join, BEFORE the distinct. This is the README idiom's own order
    * (reference/README.md:138-141 filters each per-seed join, then unions)
    * and it is what keeps the path linear at scale: inside a join task the
    * buffered bucket's texts recur, so the jaccard expression's bounded
    * shingle memo covers the working set (O(distinct-strings-per-bucket)
    * shingle builds). Round 10 measured the opposite order — verify after
    * `distinct()` + two id-joins — inflating per-pair cost ~50× past ~2^17
    * distinct texts, because the deduplicated pair stream has no text
    * locality at all (docs/SCALE.md "Measured scale slopes"). The rewrite
    * removed that cliff outright — re-measured at ×100 of sf0.1 (500k
    * docs, 2.4e8 candidates): 45.8 s, sub-linear slope 41.5, vs the fused
    * operator's 60.9 s — where the old order never finished.
    * The cost moved instead to shuffling texts through the band exchange
    * (bandCount copies) — the README idiom pays the same, and it is a
    * linear byte cost AQE handles, not a super-linear CPU cliff. A pair
    * colliding in k bands computes jaccard k times, but k-1 are memo hits
    * on both texts; `distinct()` then collapses the duplicates (sim is a
    * pure function of the pair, so distinct-on-(ids,sim) is exact).
    *
    * The fused [[bandedSelfJoinPairs]] remains the tool for explosive
    * buckets of SHORT keys (a mega-bucket's C(n,2) collisions land on one
    * join task here; the fused triangle blocking splits exactly that —
    * measured 3× on 15k near-identical names). Both paths are spec-checked
    * to produce identical pair sets; [[nearDupPairsAdaptive]] routes on a
    * bucket census. */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
                   ngramWidth: Int, bandCount: Int, bandSize: Int, seed: Long,
                   threshold: Double): DataFrame = {
    // explicit bucket repartition: the self-join below then reads ONE
    // ReusedExchange for both sides (verified in the executed plan), so
    // the minhash banding pass — the signature compute — runs once per
    // document and the band exchange ships each doc's (text, signature)
    // rows once, not once per join side
    val banded = bandedRows(df, idCol, textCol, ngramWidth, bandCount, bandSize, seed)
      .repartition(col("band"), col("band_hash"))
    val a = banded.select(col(idCol).as("id_a"), col(textCol).as("text_a"),
      col("band"), col("band_hash"))
    val b = banded.select(col(idCol).as("id_b"), col(textCol).as("text_b"),
      col("band"), col("band_hash"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", graft.functions.lsh_jaccard(col("text_a"), col("text_b"), ngramWidth))
      .filter(col("sim") > threshold)
      .select("id_a", "id_b", "sim")
      .distinct()
  }

  /** Entity-resolution pair mining: banded MinHash blocking verified by
    * normalized Levenshtein similarity `1 − lev/max(len) ≥ minSim` — the
    * classic record-linkage verifier for SHORT keys (names, titles, SKUs),
    * where the O(|a|·|b|) DP per pair is trivially bounded and edit
    * distance is the wanted semantics (shingle Jaccard under-weights
    * transpositions and single-char edits in short strings). Candidates
    * come from [[candidatePairs]] (one banding pass, ReusedExchange
    * self-join, distinct before the text joins — a pair colliding in k
    * bands pays the DP once); verification is one codegen'd builtin on
    * the deduplicated stream.
    *
    * Engine note, CLOSED in round 18: DuckDB's `levenshtein` counts
    * BYTE edits, so the cross-engine verifier semantics were pinned
    * only by the ASCII fixture. The verifier now uses the engine-owned
    * CODE-POINT distance ([[graft.functions.levenshtein_cp]]) — the
    * unit a similarity threshold over human-readable keys means (Spark
    * 4's builtin happens to agree today, spec-measured, but the unit is
    * now pinned here, not inherited). The non-ASCII gate
    * (`edit_pairs_unicode`) cross-pins it against a Python code-point
    * DP, where byte semantics would mismatch.
    *
    * Plan shape — the OPPOSITE order from [[nearDupPairs]], and measured,
    * not assumed: ids-only band join → `distinct` → broadcast text attach
    * → one DP per UNIQUE pair ([[candidatePairs]]). Near-uniform key
    * spaces (serial numbers, templated names) give shingle-MinHash a
    * narrow true/random Jaccard gap, so pairs that collide at all collide
    * in MANY bands; verifying inside the band join pays the DP per
    * collision and ships two text copies per collision row — measured
    * 3.1× SLOWER at sf0.1 (32.8 s vs 10.5 s) than deduplicating the
    * narrow id stream first. nearDupPairs' inverted order wins there
    * because its verifier has a per-text shingle memo that feeds on
    * bucket locality; the Levenshtein DP has no such memo, so unique-pair
    * count is the only thing that matters.
    *
    * Scale: pair volume is bounded by the blocking census
    * ([[candidateCensus]] is the pre-flight); per-pair cost is O(keyLen²)
    * — point this at short key columns, not documents; for
    * document-scale text use [[nearDupPairs]] (Jaccard) instead. */
  def editVerifiedPairs(df: DataFrame, idCol: String, textCol: String,
                        ngramWidth: Int, bandCount: Int, bandSize: Int,
                        seed: Long, minSim: Double): DataFrame =
    candidatePairs(df, idCol, textCol, ngramWidth, bandCount, bandSize, seed)
      .withColumn("lev",
        graft.functions.levenshtein_cp(col("text_a"), col("text_b")).cast("long"))
      .withColumn("edit_sim",
        lit(1.0) - col("lev") / greatest(length(col("text_a")), length(col("text_b"))))
      .filter(col("edit_sim") >= minSim)
      .select("id_a", "id_b", "lev", "edit_sim")

  /** [[editVerifiedPairs]] behind the [[candidateCensus]] pre-flight — the
    * same mega-bucket governor [[nearDupPairsAdaptive]] wires in front of
    * the Jaccard verifier, for the path whose candidate volume is MOST
    * prone to explode: record-linkage banding is deliberately loose
    * (recall-oriented few-band configs) over near-uniform key spaces, so
    * one hot key (a default value, an empty-ish name, a templated SKU)
    * puts C(n,2) collisions on ONE sort-merge-join task. When the largest
    * bucket exceeds `maxRelationalBucket`, candidate ENUMERATION routes
    * through the fused triangle-blocking operator
    * ([[bandedSelfJoinPairs]] at `threshold = -1`, which emits every
    * bucket collision — Jaccard ≥ 0 > −1 — with
    * numBlocks·(numBlocks+1)/2-way parallelism inside even a single
    * bucket), and the Levenshtein verify then runs on the same
    * distinct-ids → text-attach tail as the relational path. Both routes
    * share [[bandedRows]]' sub-width drop, so the PAIR SET IS IDENTICAL
    * either way (spec-pinned on a planted degenerate key cluster).
    * The census costs one extra banding pass (~2 s at 500k rows) — the
    * pre-flight price of never hitting the quadratic single-task cliff. */
  def editVerifiedPairsAdaptive(df: DataFrame, idCol: String, textCol: String,
                                ngramWidth: Int, bandCount: Int, bandSize: Int,
                                seed: Long, minSim: Double,
                                maxRelationalBucket: Long = 8192L,
                                numBlocks: Int = 8): DataFrame = {
    // The fused fallback ([[bandedSelfJoinPairs]]) carries ids as longs;
    // a non-integral id (string UUID — plausible in record linkage) would
    // cast to null and silently drop pairs ONLY when the hot-bucket route
    // trips, breaking the identical-pair-set contract. Fail loudly up
    // front instead; the relational [[editVerifiedPairs]] keeps native id
    // types if longs are unavailable.
    df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case t => throw new IllegalArgumentException(
        s"editVerifiedPairsAdaptive requires an integral id column (the " +
          s"fused hot-bucket route carries ids as longs); '$idCol' is $t. " +
          "Use editVerifiedPairs, or map ids to longs first.")
    }
    val (_, maxBucket, _) =
      candidateCensus(df, idCol, textCol, ngramWidth, bandCount, bandSize, seed)
    if (maxBucket <= maxRelationalBucket)
      editVerifiedPairs(df, idCol, textCol, ngramWidth, bandCount, bandSize,
        seed, minSim)
    else {
      val idType = df.schema(idCol).dataType
      val cand = bandedSelfJoinPairs(df, idCol, textCol, ngramWidth,
          bandCount, bandSize, seeds = Seq(seed), threshold = -1.0,
          numBlocks = numBlocks)
        .select(col("id_a").cast(idType).as("id_a"),
          col("id_b").cast(idType).as("id_b"))
      cand
        .join(df.select(col(idCol).as("id_a"), col(textCol).as("text_a")), "id_a")
        .join(df.select(col(idCol).as("id_b"), col(textCol).as("text_b")), "id_b")
        .withColumn("lev",
        graft.functions.levenshtein_cp(col("text_a"), col("text_b")).cast("long"))
        .withColumn("edit_sim", lit(1.0) -
          col("lev") / greatest(length(col("text_a")), length(col("text_b"))))
        .filter(col("edit_sim") >= minSim)
        .select("id_a", "id_b", "lev", "edit_sim")
    }
  }

  /** Candidate-pair census over the banded blocking buckets: Σ C(n,2) and
    * the largest bucket, computed straight from bucket SIZES (one
    * map-side-combined aggregation over (band, band_hash) counts) without
    * materializing a single pair. Returns (candidatePairs, maxBucket,
    * inputRows). Cost is one banding pass + a count-only shuffle — ~2 s on
    * a 500k-doc corpus — against which [[nearDupPairsAdaptive]] routes
    * between the relational and fused verification paths. Also useful as a
    * standalone pre-flight: a census result of 10^10 pairs says "fix your
    * banding or expect an all-pairs bill" BEFORE the cluster pays it. */
  def candidateCensus(df: DataFrame, idCol: String, textCol: String,
                      ngramWidth: Int, bandCount: Int, bandSize: Int,
                      seed: Long): (Long, Long, Long) = {
    val r = bandedRows(df, idCol, textCol, ngramWidth, bandCount, bandSize, seed)
      .groupBy("band", "band_hash").agg(count(lit(1)).as("n"))
      .agg(coalesce(sum((col("n") * (col("n") - 1) / 2).cast("long")), lit(0L)),
        coalesce(max(col("n")), lit(0L)),
        coalesce((sum(col("n")) / bandCount).cast("long"), lit(0L)))
      .collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** [[nearDupPairs]] with mega-bucket protection: runs [[candidateCensus]]
    * first and routes to the fused [[bandedSelfJoinPairs]] operator when a
    * single bucket (or, if the caller sets a budget, total candidate
    * volume) exceeds what the relational path handles gracefully. Same
    * (id_a, id_b, sim) output either way — pair-set and sim equality
    * across the three paths is spec-pinned.
    *
    * HISTORY of the routing (measured, local[32], sf0.1 documents
    * replicated with structure-preserving ciphers — ScaleBench /
    * docs/SCALE.md): round 10's relational path verified AFTER
    * `distinct()` + two id-joins, lost all text locality, and effectively
    * never finished at ×100 (500k docs, 2.4e8 candidates) — the router
    * then existed to dodge that cliff. Round 11 moved verification inside
    * the band join (the README idiom's order), and the re-measured ×100
    * relational run is 45.8 s vs the fused operator's 60.9 s, shuffling
    * 3.5× fewer bytes — so candidate VOLUME no longer routes by default
    * (`maxRelationalCandidates` = Long.MaxValue; set a finite budget to
    * re-enable, e.g. when verification CPU must be bounded up front).
    *
    * What still routes: `maxRelationalBucket` = 8192. A degenerate
    * bucket's C(n,2) collisions land on ONE sort-merge-join task
    * (8192²/2 ≈ 3.4e7 pairs ≈ minutes, growing quadratically); the fused
    * operator's triangle blocking splits exactly that — measured 3× on
    * 15k near-identical short keys. The census reads both signals from
    * bucket counts alone, ~2 s at 500k docs, without materializing a
    * pair. */
  def nearDupPairsAdaptive(df: DataFrame, idCol: String, textCol: String,
                           ngramWidth: Int, bandCount: Int, bandSize: Int, seed: Long,
                           threshold: Double,
                           maxRelationalCandidates: Long = Long.MaxValue,
                           maxRelationalBucket: Long = 8192L,
                           numBlocks: Int = 8): DataFrame = {
    val (cand, maxBucket, _) =
      candidateCensus(df, idCol, textCol, ngramWidth, bandCount, bandSize, seed)
    if (cand <= maxRelationalCandidates && maxBucket <= maxRelationalBucket)
      nearDupPairs(df, idCol, textCol, ngramWidth, bandCount, bandSize, seed, threshold)
    else {
      val idType = df.schema(idCol).dataType
      bandedSelfJoinPairs(df, idCol, textCol, ngramWidth, bandCount, bandSize,
          seeds = Seq(seed), threshold = threshold, numBlocks = numBlocks)
        .select(col("id_a").cast(idType).as("id_a"),
          col("id_b").cast(idType).as("id_b"), col("sim"))
    }
  }

  /** Fused banded self-join: the same pair set as the README's per-seed
    * blocking join + jaccard filter (`lsh_min(..)[1]` equality per seed,
    * UNION, `lsh_jaccard > threshold`), computed as a native pairwise loop
    * inside buckets instead of a join. Why: a relational join materializes
    * every candidate pair through join machinery (~2 µs/pair measured) while
    * the jaccard kernel itself costs ~70 ns/pair; at ~10^8 bucket pairs the
    * machinery IS the query. Shape:
    *
    *  1. per seed, hash every row's single band value (family cache — cheap);
    *  2. salt rows into `numBlocks` deterministic blocks and replicate each
    *     row to every (block-pair) group of its bucket — the classic triangle
    *     blocking for self-joins, giving numBlocks·(numBlocks+1)/2-way
    *     parallelism inside even a single mega-bucket (AQE cannot split a
    *     single key; this does);
    *  3. flatMapGroups: intern each member's sorted shingle array once per
    *     group, run the pairwise merge-scan loop natively, emit passing pairs;
    *  4. distinct across seeds (the UNION).
    */
  def bandedSelfJoinPairs(df: DataFrame, idCol: String, textCol: String,
                          ngramWidth: Int, bandCount: Int, bandSize: Int, seeds: Seq[Long],
                          threshold: Double, numBlocks: Int = 8): DataFrame = {
    import org.apache.spark.sql.graft.{BlockedSelfJoin, PlanShim}
    val spark = df.sparkSession
    // self-register the whole-operator planner strategy (idempotent): the
    // operator must work from a bare session, not only after
    // LshFunctions.register — a latent ordering dependency otherwise
    // (surfaced by scoped Verify runs planning this query first)
    graft.sql.LshFunctions.ensurePlannerStrategy(spark)
    val nb = numBlocks
    // Rows shorter than the n-gram width all carry the EMPTY shingle set:
    // they hash identically in every band (one catastrophic mega-bucket) yet
    // can never pass a threshold > 0 (jaccard of an empty set is 0), so they
    // are dropped before blocking.
    val salted = df
      .filter(col(textCol).isNotNull && length(col(textCol)) >= ngramWidth)
      .select(col(idCol).cast("long").as("id"), col(textCol).as("text"),
        pmod(col(idCol).cast("long"), lit(nb)).cast("int").as("salt"))
    // Codegen'd band explosion: per seed, posexplode the lsh_min band array
    // (the family cache makes per-seed hashing cheap), tag with a
    // (seedIndex << 32) | band blocking key, and union — one relational child
    // the optimizer can prune/push into.
    val perSeed = seeds.zipWithIndex.map { case (seed, si) =>
      salted
        .select(col("id"), col("text"), col("salt"),
          posexplode(graft.functions.lsh_min(col("text"), ngramWidth, bandCount, bandSize, seed)))
        .select((lit(si.toLong << 32) + col("pos").cast("long")).as("bk"),
          col("col").as("h"), col("salt"), col("id"), col("text"))
    }.reduce(_ unionAll _)
    // Triangle block replication: each row meets every block once, so every
    // bucket pair meets in exactly one (blo, bhi) group per band —
    // numBlocks·(numBlocks+1)/2-way parallelism inside even a single
    // mega-bucket (AQE cannot split one key; this does).
    val exploded = perSeed
      .select(col("bk"), col("h"), col("salt"), col("id"), col("text"),
        explode(sequence(lit(0), lit(nb - 1))).as("other"))
      .select(col("bk"), col("h"),
        least(col("salt"), col("other")).cast("int").as("blo"),
        greatest(col("salt"), col("other")).cast("int").as("bhi"),
        col("salt"), col("id"), col("text"))
    // Strict repartition on the blocking keys BEFORE the operator: the
    // in-group work is quadratic in group size, which AQE cannot see — it
    // sizes shuffles on input bytes, and the exploded input is tiny, so the
    // ENSURE_REQUIREMENTS exchange gets coalesced to ~3 partitions and the
    // triangle parallelism evaporates (measured: 3 tasks, 2.2s wall for a
    // 0.15s-wall workload). repartition(n, cols) is REPARTITION_BY_NUM,
    // which AQE must not touch, and it already satisfies the operator's
    // ClusteredDistribution so EnsureRequirements adds only the local sort.
    val shuffleParts = SparkEnv.shufflePartitions(spark)
    val clustered = exploded.repartition(shuffleParts,
      col("bk"), col("h"), col("blo"), col("bhi"))
    // the custom whole-operator plan node (see BlockedSelfJoin scaladoc):
    // clustered+sorted on (bk, h, blo, bhi), streamed group-at-a-time
    PlanShim.ofRows(spark,
        BlockedSelfJoin(ngramWidth, threshold, BlockedSelfJoin.outputAttrs(),
          PlanShim.logical(clustered)))
      .distinct() // a pair found in k bands carries the same sim k times
  }

  /** Near-dup pairs verified by SIGNATURE similarity instead of exact
    * Jaccard: each doc carries `k` independent min-hash components
    * (`lsh_min` with bandSize = 1, so each "band" is one raw min-hash), and
    * the estimator is the fraction of equal components — an unbiased
    * estimate of Jaccard with stderr ≈ 1/sqrt(k). Why it exists: the exact
    * verifier re-attaches TEXTS to every candidate pair, which at 100 TB
    * moves document payloads through two id joins; this path never touches
    * texts after the one hashing scan — candidates and verification both
    * run on (id, signature) rows, ~8k bytes/doc. Use when an estimated
    * sim with known error beats paying the text shuffle (pre-filtering
    * before an exact pass, or dedup at thresholds where ±1/sqrt(k) is
    * immaterial). Returns (id_a, id_b, est_sim) with est_sim > threshold;
    * blocking uses `bandCount`×`bandSize` banding exactly like
    * [[nearDupPairs]]. */
  def nearDupPairsBySignature(df: DataFrame, idCol: String, textCol: String,
                              ngramWidth: Int, bandCount: Int, bandSize: Int,
                              seed: Long, k: Int, sigSeed: Long,
                              threshold: Double): DataFrame = {
    require(k >= 1, s"signature length must be >= 1, got $k")
    val n = SparkEnv.shufflePartitions(df.sparkSession)
    // one pass computes BOTH the blocking bands and the k-component
    // signature; only (id, bands, sig) ever shuffles. The explode is the
    // OUTER variant + a null filter, not a plain posexplode: Catalyst's
    // InferFiltersFromGenerate fires on inner attribute generators and
    // pushes the `size(bands) > 0` filter it infers below the spread
    // exchange, re-evaluating BOTH lsh_min kernels per row at the scan
    // (outer generates are exempt; empty-band rows surface as one null
    // row and die in the same-stage filter — bit-identical output).
    // bucket repartition → the self-join reads ONE ReusedExchange: both
    // lsh_min passes run once per document.
    val hashed = df
      .filter(length(col(textCol)) >= ngramWidth)
      .repartition(n, col(idCol))
      .select(col(idCol).as("id"),
        graft.functions.lsh_min(col(textCol), ngramWidth, bandCount, bandSize, seed).as("bands"),
        graft.functions.lsh_min(col(textCol), ngramWidth, k, 1, sigSeed).as("sig"))
    val banded = hashed.select(col("id"), col("sig"),
        posexplode_outer(col("bands")))
      .filter(col("col").isNotNull)
      .select(col("id"), col("sig"), col("pos").as("band"), col("col").as("band_hash"))
      .repartition(col("band"), col("band_hash"))
    val a = banded.select(col("id").as("id_a"), col("sig").as("sig_a"),
      col("band"), col("band_hash"))
    val b = banded.select(col("id").as("id_b"), col("sig").as("sig_b"),
      col("band"), col("band_hash"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b")
      .distinct()
      // codegen'd agreement count (bit-equal to the zip_with fold: an
      // integer count, then one double division)
      .withColumn("est_sim",
        org.apache.spark.sql.graft.ColumnShim.column(
          org.apache.spark.sql.graft.MatchCount(
            org.apache.spark.sql.graft.ColumnShim.expression(col("sig_a")),
            org.apache.spark.sql.graft.ColumnShim.expression(col("sig_b"))))
          .cast("double") / lit(k.toDouble))
      .filter(col("est_sim") > threshold)
      .select("id_a", "id_b", "est_sim")
  }

  /** Skew-hardened bipartite band join: `a JOIN b USING (band, band_hash)`,
    * exact same rows as the plain join, but adversarial mega-buckets cannot
    * serialize onto one reducer. The plain hash join puts ALL m×n pairs of a
    * hot `(band, band_hash)` bucket in ONE task, and AQE cannot help — its
    * skew splitting sizes on shuffle-file BYTES, which for a band join are
    * tiny ids; the blowup is in the join OUTPUT (docs/SCALE.md). The fused
    * [[bandedSelfJoinPairs]] solves this for self-joins; this is the
    * two-sided (batch×index, A×B) counterpart.
    *
    * Shape: per-bucket counts on both sides (map-side-combined count-only
    * aggregations), buckets with `countA·countB > hotThreshold` form the hot
    * set — broadcast both ways (it is by construction tiny: a handful of
    * degenerate keys, or the input was not worth blocking). Cold buckets take
    * the plain join untouched. Hot-bucket rows of `a` scatter into `blocks`
    * deterministic blocks by `scatterA` (a per-row-entropy column — an id,
    * never the join key) and hot rows of `b` replicate to every block, so a
    * hot bucket's pairs land on `blocks` tasks ((m/blocks)·n per task instead
    * of m·n). Union of the two branches = the exact plain-join row set
    * (spec-pinned, plus a partition-spread assertion on an adversarial hot
    * bucket). Pick `blocks` ≈ m·n/perTaskPairBudget for the largest bucket
    * you intend to survive.
    *
    * `a` and `b` must have disjoint non-key column names (same contract as
    * the plain `join(..., Seq("band", "band_hash"))`).
    *
    * Each input is consumed by the count pass AND its cold/hot branch — if
    * an input is an expensive pipeline (banding over a raw corpus), persist
    * or checkpoint it first rather than paying the kernel repeatedly
    * ([[saveSignatureIndex]] does exactly this internally; its persisted
    * index avoids probe-time counting altogether, which is why the
    * batch-vs-index path classifies at BUILD time instead of calling
    * this). */
  def bandJoinSkewSafe(a: DataFrame, b: DataFrame, scatterA: Column,
                       hotThreshold: Long = 1000000L, blocks: Int = 16): DataFrame = {
    require(hotThreshold >= 1, s"hotThreshold must be >= 1, got $hotThreshold")
    require(blocks >= 2, s"blocks must be >= 2, got $blocks")
    val keys = Seq("band", "band_hash")
    val overlap = (a.columns.toSet & b.columns.toSet) -- keys
    require(overlap.isEmpty, s"non-key columns must be disjoint, both sides have: $overlap")
    val ca = a.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__ca"))
    val cb = b.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__cb"))
    // the hot set is small by construction; broadcast() it so the cold/hot
    // routing of both full sides is a narrow broadcast semi/anti join, never
    // an extra shuffle of a or b
    val hot = broadcast(
      ca.join(cb, keys)
        .filter(col("__ca") * col("__cb") > hotThreshold)
        .select(keys.map(col): _*))
    val cold = a.join(hot, keys, "left_anti")
      .join(b.join(hot, keys, "left_anti"), keys)
    // strict REPARTITION_BY_NUM on (keys, __blk) for the hot branch: the
    // blocked rows are tiny in BYTES, so AQE would coalesce the
    // ENSURE_REQUIREMENTS exchange right back into a handful of tasks and
    // erase the parallelism the blocking just bought (the same
    // output-blind-AQE trap BlockedSelfJoin guards against). The cold branch
    // is left to AQE on purpose — its buckets are bounded by construction,
    // and coalescing them is the right call.
    val n = SparkEnv.shufflePartitions(a.sparkSession)
    val blkKeys = (keys :+ "__blk").map(col)
    val aHot = a.join(hot, keys, "left_semi")
      .withColumn("__blk", pmod(xxhash64(scatterA), lit(blocks.toLong)).cast("int"))
      .repartition(n, blkKeys: _*)
    val bHot = b.join(hot, keys, "left_semi")
      .withColumn("__blk", explode(sequence(lit(0), lit(blocks - 1))))
      .repartition(n, blkKeys: _*)
    val hotJoined = aHot.join(bHot, keys :+ "__blk").drop("__blk")
    cold.unionByName(hotJoined)
  }

  /** Near-dup pairs between two DIFFERENT corpora: banded blocking on both
    * sides, the mega-bucket-hardened [[bandJoinSkewSafe]] band join, then
    * exact-Jaccard verification — the A×B counterpart of [[nearDupPairs]]
    * for one-off comparisons (benchmark-vs-corpus, vendor-feed-vs-corpus).
    * For REPEATED batches against the same corpus, build the persisted
    * index instead ([[saveSignatureIndex]] + [[nearDupAgainstIndex]]) and
    * pay the corpus-side hashing once. Returns `(id_a, id_b, sim)` with
    * sim > threshold; both banded inputs are projected to ids before the
    * join (texts re-attach at verification). */
  def nearDupJoin(a: DataFrame, b: DataFrame,
                  idColA: String, textColA: String, idColB: String, textColB: String,
                  ngramWidth: Int, bandCount: Int, bandSize: Int, seed: Long,
                  threshold: Double,
                  hotThreshold: Long = 1000000L, blocks: Int = 16): DataFrame = {
    // Deliberately NOT checkpointed: bandJoinSkewSafe consumes each side
    // three times (count + cold + hot), but measured at sf0.1 an eager
    // localCheckpoint COSTS more than the banding recompute it saves
    // (1.7 s -> 3.0 s: materialization + the lost scan/join codegen fusion
    // outweigh two extra cheap passes). Callers whose inputs are genuinely
    // expensive can persist before calling; the hash kernel itself is cheap
    // relative to its scan.
    val ra = bandedRows(a, idColA, textColA, ngramWidth, bandCount, bandSize, seed)
      .select(col(idColA).as("id_a"), col("band"), col("band_hash"))
    val rb = bandedRows(b, idColB, textColB, ngramWidth, bandCount, bandSize, seed)
      .select(col(idColB).as("id_b"), col("band"), col("band_hash"))
    val cand = bandJoinSkewSafe(ra, rb, col("id_a"), hotThreshold, blocks)
      .select("id_a", "id_b")
      .distinct()
    cand
      .join(a.select(col(idColA).as("id_a"), col(textColA).as("__text_a")), "id_a")
      .join(b.select(col(idColB).as("id_b"), col(textColB).as("__text_b")), "id_b")
      .withColumn("sim",
        graft.functions.lsh_jaccard(col("__text_a"), col("__text_b"), ngramWidth))
      .filter(col("sim") > threshold)
      .select("id_a", "id_b", "sim")
  }

  /** Persist the corpus's banded MinHash signatures as a bucketed table —
    * the incremental-ingestion index. `(band, band_hash, corpus_id)` rows,
    * bucketed AND sorted on the band-join key: every future
    * [[nearDupAgainstIndex]] batch joins the index with **zero corpus-side
    * exchange** (the bucketed scan satisfies the join's distribution), so
    * admitting a new batch to a 100 TB deduplicated corpus costs
    * hash+shuffle of the BATCH, never a corpus pass. Ids only — texts stay
    * in the corpus table and re-attach per candidate by id join.
    *
    * Degenerate buckets are split out AT BUILD TIME: buckets with more than
    * `hotBucketCap` members (boilerplate-dominated corpora produce them; the
    * empty-shingle guard in [[bandedRows]] removes only one cause) go to a
    * sidecar table `<table>_hot` instead of the main index. The probe join
    * then grid-blocks just those rows ([[nearDupAgainstIndex]]) — a
    * classification that costs ZERO per batch because it was paid once at
    * build time, which is the only placement compatible with "a batch pays
    * only its own cost" (probe-time counting would re-scan the corpus per
    * batch).
    *
    * Rebuild after compaction; for rolling ingestion append the admitted
    * batch's rows with [[appendToSignatureIndex]] — NOT a bare `insertInto`
    * into the main table, which would break the probe's invariant that
    * hot-bucket rows live only in the sidecar (an appended row in a hot
    * bucket would become invisible to hot-branch probes). Appends cannot
    * re-classify buckets (a cold bucket growing past the cap stays cold
    * until the next rebuild — same contract as "rebuild after
    * compaction"). */
  def saveSignatureIndex(corpus: DataFrame, table: String, numBuckets: Int,
                         idCol: String, textCol: String,
                         ngramWidth: Int, bandCount: Int, bandSize: Int, seed: Long,
                         hotBucketCap: Long = 100000L): Unit = {
    require(hotBucketCap >= 1, s"hotBucketCap must be >= 1, got $hotBucketCap")
    val keys = Seq("band", "band_hash")
    // persist for the build's duration: three consumers follow (bucket
    // counts, cold write, hot write) and the CPU-bound minhash banding pass
    // must run ONCE, not three times (measured 2.9s -> 1.6s on the
    // incremental_dedup bench line). Ids+hashes only — ~24 B/row, so even a
    // 100 TB corpus's banded rows fit MEMORY_AND_DISK at build time.
    val spark = corpus.sparkSession
    val rows = bandedRows(corpus, idCol, textCol, ngramWidth, bandCount, bandSize, seed)
      .select(col("band"), col("band_hash"), col(idCol).as("corpus_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // the hot KEY set collects to the driver: it is bounded by
      // |corpus|·bands/cap keys (a corpus would need more over-cap
      // mega-buckets than rows-per-cap to blow this up — such a corpus is
      // all boilerplate and has bigger problems). Collecting once beats a
      // broadcast subquery, which each downstream write job would
      // re-aggregate over the full banded rows (measured: two extra ~9 s
      // executor-time aggregation stages at sf0.1).
      val keyFields = rows.select(keys.map(col): _*).schema
      val hotKeyRows = rows.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__cnt"))
        .filter(col("__cnt") > hotBucketCap)
        .select(keys.map(col): _*)
        .collect()
      BucketedWrite.dropTable(spark, s"${table}_hot")
      // the two store writes stay SEQUENTIAL deliberately: both are
      // 32-task CPU-saturating jobs over the already-materialized cache
      // (the hot-key collect populated it), so overlapping them buys no
      // idle capacity — measured at sf0.1, the overlapped form inflated
      // the main write's wall 0.8 -> 2.1 s (slot convoy), strictly worse
      // than the 1.4 s sequential sum (guide §2.6 helps scheduling-floor
      // jobs, not saturating ones)
      if (hotKeyRows.isEmpty) {
        // nothing degenerate: the main index is the full row set and the
        // sidecar is a metadata-only empty table (its existence tells the
        // probe the index is sidecar-aware)
        BucketedWrite.saveBucketed(rows, table, numBuckets, keys)
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), rows.schema)
          .write.format("parquet").mode("overwrite").saveAsTable(s"${table}_hot")
      } else {
        val hotKeys = broadcast(spark.createDataFrame(
          java.util.Arrays.asList(hotKeyRows: _*), keyFields))
        BucketedWrite.saveBucketed(rows.join(hotKeys, keys, "left_anti"),
          table, numBuckets, keys)
        rows.join(hotKeys, keys, "left_semi")
          .write.format("parquet").mode("overwrite").saveAsTable(s"${table}_hot")
      }
    } finally rows.unpersist()
  }

  /** Append an admitted batch's signatures to a [[saveSignatureIndex]]
    * index, maintaining the hot/cold routing invariant the probe relies on:
    * rows in sidecar-classified buckets go to `<table>_hot`, everything
    * else to the bucketed main table. Cost: hashing + one tiny broadcast of
    * the hot key set — the batch's own cost, never a corpus pass.
    *
    * Appends never RE-classify buckets: a cold bucket that grows past the
    * build-time `hotBucketCap` through repeated appends stays in the main
    * table (re-creating the single-reducer pathology the sidecar exists to
    * prevent) until the next [[saveSignatureIndex]] rebuild. Probing per
    * append for this would cost the corpus pass the whole design avoids, so
    * drift detection is a separate maintenance scan: run
    * [[signatureIndexHealth]] on whatever cadence compactions run and
    * rebuild when it returns rows.
    *
    * MATERIALIZE the admitted frame before calling this when it was
    * derived from a probe of the SAME index ([[nearDupAgainstIndex]]):
    * the append invalidates any cache over plans reading the table, and a
    * lazy recompute would read its own appended signatures — the batch
    * colliding with itself under a lookup that predates it, which the
    * probe's coverage guard refuses loudly. `localCheckpoint(eager=true)`
    * (what `IncrementalCuration.admitBatch` does) pins the data and severs
    * the lineage. */
  def appendToSignatureIndex(batch: DataFrame, table: String,
                             idCol: String, textCol: String,
                             ngramWidth: Int, bandCount: Int, bandSize: Int,
                             seed: Long): Unit = {
    val spark = batch.sparkSession
    val keys = Seq("band", "band_hash")
    val rows = bandedRows(batch, idCol, textCol, ngramWidth, bandCount, bandSize, seed)
      .select(col("band"), col("band_hash"), col(idCol).as("corpus_id"))
    if (spark.catalog.tableExists(s"${table}_hot")) {
      // pin the hot KEY set BEFORE either write: built once instead of
      // once per write job, and — because the hot append mutates the very
      // table the key set reads — the overlapped writes below must both
      // route against the PRE-append classification (appends never
      // re-classify, so the set is append-invariant anyway; pinning makes
      // that a property of the plan, not an argument about listing races)
      val keyFields = spark.table(s"${table}_hot").select(keys.map(col): _*).schema
      val hotKeys = broadcast(spark.createDataFrame(java.util.Arrays.asList(
        spark.table(s"${table}_hot").select(keys.map(col): _*).distinct()
          .collect(): _*), keyFields))
      // persist: the banding pass (the batch's CPU cost) must run once,
      // not once per store write — the cold append computes and caches
      // it, the hot append reads the cache. The writes themselves stay
      // sequential: both saturate the cores over the cache, so overlap
      // buys nothing and the measured slot convoy costs wall (the
      // saveSignatureIndex note above)
      val pinned = rows.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        BucketedWrite.alignedForInsert(
            pinned.join(hotKeys, keys, "left_anti"), table)
          .write.mode("append").insertInto(table)
        pinned.join(hotKeys, keys, "left_semi")
          .write.mode("append").insertInto(s"${table}_hot")
      } finally pinned.unpersist()
    } else {
      BucketedWrite.alignedForInsert(rows, table)
        .write.mode("append").insertInto(table)
    }
  }

  /** Maintenance scan for append drift on a [[saveSignatureIndex]] index:
    * returns the main-table buckets whose row count now exceeds
    * `hotBucketCap` (i.e. buckets that WOULD be sidecar-classified by a
    * rebuild but are still on the probe's cold path). Empty result = the
    * build-time classification still holds. One aggregation pass over the
    * ids-only index table — run it on the compaction cadence, not per
    * append ([[appendToSignatureIndex]] deliberately never pays a corpus
    * pass); any rows returned mean a rebuild is due. */
  def signatureIndexHealth(spark: org.apache.spark.sql.SparkSession,
                           table: String, hotBucketCap: Long): DataFrame =
    spark.table(table)
      .groupBy("band", "band_hash")
      .agg(count(lit(1)).as("bucket_rows"))
      .filter(col("bucket_rows") > hotBucketCap)

  /** Retention-delete compaction for a [[saveSignatureIndex]] index — the
    * third leg of the takedown story ([[Dedup.compactGramIndex]] for gram
    * spans, [[Ann.compactIvfPqIndex]] for embeddings): remove every banded
    * row of `deletedIds` from BOTH stores (bucketed main + hot sidecar)
    * without re-hashing, re-banding, or even touching the corpus text —
    * the index is ids+hashes only, so compaction is an id-column-scan-bound
    * rewrite, never a corpus pass. The deletion set broadcasts (takedown
    * lists are bounded; a corpus-scale deletion is a rebuild).
    *
    * Bucket CLASSIFICATION stays frozen, symmetric with the append
    * contract: a hot bucket whose population drops below the cap stays in
    * the sidecar until the next rebuild — classification is probe ROUTING,
    * not correctness, so deferring it is safe, and re-classifying here
    * would rewrite cold partitions the deletion never touched. One
    * documented consequence: both [[appendToSignatureIndex]] and
    * [[nearDupAgainstIndex]] derive the hot key set FROM the sidecar's
    * rows, so a hot bucket compaction empties entirely is implicitly
    * de-classified (future appends route it cold); that is self-consistent
    * on both paths, and [[signatureIndexHealth]] re-flags it if it ever
    * re-grows past the cap.
    *
    * Crash safety, the `commitRepair` discipline: leftover
    * `{table}_compact_tmp` / `{table}_hot_compact_tmp` (catalog entry OR
    * surviving warehouse directory) REFUSES the run. Commit order — stage
    * both survivor sets → swap the sidecar → swap the main table. Before
    * the first swap the index is untouched (drop the scratches, re-run);
    * between the swaps the index over-detects against deleted main rows
    * only until a re-run (which then rewrites just the main side — the
    * per-store no-op check makes re-runs converge); a crash inside a swap
    * leaves the scratch holding the only copy — the refusal message names
    * the RENAME that completes the commit.
    *
    * A store whose rows never matched the deletion set is NOT rewritten —
    * its files stay bit-identical, same contract as the ANN repairs.
    * Returns one row per rewritten store `(store, removed_rows)`, empty if
    * no indexed row matched. */
  def compactSignatureIndex(spark: org.apache.spark.sql.SparkSession,
                            table: String, deletedIds: DataFrame): DataFrame = {
    import spark.implicits._
    val hotTable = s"${table}_hot"
    val scratch = s"${table}_compact_tmp"
    val hotScratch = s"${table}_hot_compact_tmp"
    Seq(scratch, hotScratch).foreach { s =>
      require(!BucketedWrite.scratchLeftover(spark, s),
        s"$s exists: a prior compaction of '$table' was interrupted. If " +
          "the live table still exists, DROP the scratch and re-run; if " +
          "only the scratch survives (crash inside the swap), ALTER TABLE " +
          "<scratch> RENAME TO <live> completes the commit.")
    }
    val del = broadcast(deletedIds
      .select(col(deletedIds.columns.head).cast("long").as("corpus_id"))
      .distinct())
    val numBuckets = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec.map(_.numBuckets)
      .getOrElse(throw new IllegalStateException(
        s"$table is not a bucketed signature index"))
    // the two per-store match counts are independent TINY read-only jobs
    // (broadcast-probe scans dominated by the scheduling floor) —
    // overlapped (guide §2.6); the heavier staging writes below stay
    // sequential, and the swaps stay sequential and ordered (sidecar
    // first), which is the crash contract
    val hotLive = spark.catalog.tableExists(hotTable)
    val Seq(mainRemoved, hotRemoved) = Par.run(spark, Seq[(String, () => Long)](
      (s"compactSignatureIndex($table): main match count", () =>
        spark.table(table).join(del, Seq("corpus_id"), "left_semi").count()),
      (s"compactSignatureIndex($table): hot match count", () =>
        if (hotLive)
          spark.table(hotTable).join(del, Seq("corpus_id"), "left_semi").count()
        else 0L)))
    // stage every survivor set BEFORE the first swap: the only
    // unrecoverable-by-rerun window is inside a RENAME, and staging first
    // keeps that window to the two metadata operations per store
    // re-select the canonical column order: a USING-column join moves the
    // join key to the front, and the rewritten table must keep the layout
    // appendToSignatureIndex's positional insertInto expects
    val cols = Seq("band", "band_hash", "corpus_id").map(col)
    // the staging writes stay sequential: each is a saturating scan+write
    // (the overlap-vs-convoy measurement in saveSignatureIndex's note)
    if (mainRemoved > 0)
      BucketedWrite.saveBucketed(
        spark.table(table).join(del, Seq("corpus_id"), "left_anti")
          .select(cols: _*),
        scratch, numBuckets, Seq("band", "band_hash"))
    if (hotRemoved > 0)
      spark.table(hotTable).join(del, Seq("corpus_id"), "left_anti")
        .select(cols: _*)
        .write.format("parquet").mode("overwrite").saveAsTable(hotScratch)
    if (hotRemoved > 0) {
      BucketedWrite.dropTable(spark, hotTable)
      spark.sql(s"ALTER TABLE `$hotScratch` RENAME TO `$hotTable`")
    }
    if (mainRemoved > 0) {
      BucketedWrite.dropTable(spark, table)
      spark.sql(s"ALTER TABLE `$scratch` RENAME TO `$table`")
    }
    Seq(("main", mainRemoved), ("hot", hotRemoved))
      .filter(_._2 > 0).toDF("store", "removed_rows")
  }

  /** Near-dup pairs between an incoming `batch` and an indexed corpus
    * ([[saveSignatureIndex]]): band-collide the batch's signatures against
    * the index, then exact-Jaccard-verify each candidate. Returns
    * `(batch_id, corpus_id, sim)` with sim > threshold — the admission
    * filter for incremental dedup ("drop the batch doc if it near-dups
    * anything already admitted"). The LSH params MUST match the ones the
    * index was built with (same family, same seed) or recall silently
    * collapses; batch docs that also appear in the corpus id-space are
    * excluded from self-pairing. `corpus` is the id → text lookup for
    * candidate verification and must span EVERY id ever indexed (the
    * build corpus plus all appended batches): a collided id missing
    * from it fails the job loudly (raise_error) rather than silently
    * dropping the pair.
    *
    * Mega-bucket hardening: if the index was built with a `<table>_hot`
    * sidecar, batch rows in those degenerate buckets are grid-blocked —
    * scattered into `blocks` deterministic blocks against a ×blocks
    * replication of the (small) hot-row set, behind strict
    * REPARTITION_BY_NUM exchanges — so a hot bucket's m·n candidate pairs
    * spread over `blocks` tasks instead of one reducer, while the cold path
    * keeps the zero-index-side-exchange bucketed join untouched. Per-batch
    * cost: the batch's own rows plus the hot rows only — never a corpus
    * scan (the hot/cold split was decided at build time). Indexes built
    * before the sidecar existed probe exactly as before. */
  def nearDupAgainstIndex(indexTable: String, corpus: DataFrame, batch: DataFrame,
                          idCol: String, textCol: String,
                          ngramWidth: Int, bandCount: Int, bandSize: Int, seed: Long,
                          threshold: Double, blocks: Int = 16): DataFrame = {
    require(blocks >= 2, s"blocks must be >= 2, got $blocks")
    val spark = batch.sparkSession
    val keys = Seq("band", "band_hash")
    val idx = spark.table(indexTable)
    val batchRows = bandedRows(batch, idCol, textCol, ngramWidth, bandCount, bandSize, seed)
      .select(col(idCol).as("batch_id"), col("band"), col("band_hash"))
    // emptiness, not just existence: the common no-degenerate-buckets case
    // writes a metadata-only empty sidecar, and paying two strict
    // repartition exchanges plus an empty grid join per probe for it would
    // tax every healthy index. The limit(1) peek is one metadata-cheap job
    // at plan-construction time.
    val sidecarLive = spark.catalog.tableExists(s"${indexTable}_hot") &&
      !spark.table(s"${indexTable}_hot").limit(1).isEmpty
    val collided =
      if (!sidecarLive)
        batchRows.join(idx, keys)
      else {
        val hotRows = spark.table(s"${indexTable}_hot")
        val hotKeys = broadcast(hotRows.select(keys.map(col): _*).distinct())
        val cold = batchRows.join(hotKeys, keys, "left_anti").join(idx, keys)
        val n = SparkEnv.shufflePartitions(spark)
        val blkKeys = (keys :+ "__blk").map(col)
        val bHot = batchRows.join(hotKeys, keys, "left_semi")
          .withColumn("__blk", pmod(xxhash64(col("batch_id")), lit(blocks.toLong)).cast("int"))
          .repartition(n, blkKeys: _*)
        val iHot = hotRows
          .withColumn("__blk", explode(sequence(lit(0), lit(blocks - 1))))
          .repartition(n, blkKeys: _*)
        cold.unionByName(bHot.join(iHot, keys :+ "__blk").drop("__blk"))
      }
    val cand = collided
      .filter(col("batch_id") =!= col("corpus_id"))
      .select("batch_id", "corpus_id")
      .distinct()
    // the corpus lookup must COVER every id the index can collide with
    // (day 1 plus every batch ever appended) — a lookup missing an
    // indexed id would silently drop its candidate pairs at an inner
    // join and admit near-dups with no error, so the attach is a LEFT
    // join with a raise_error guard: coverage holes fail the job loudly,
    // at zero extra passes (the guard rides the join's own projection)
    cand
      .join(batch.select(col(idCol).as("batch_id"), col(textCol).as("batch_text")), "batch_id")
      .join(corpus.select(col(idCol).as("corpus_id"), col(textCol).as("corpus_text")),
        Seq("corpus_id"), "left")
      .withColumn("corpus_text",
        when(col("corpus_text").isNull, raise_error(concat(
          lit("nearDupAgainstIndex: indexed corpus_id "), col("corpus_id"),
          lit(s" collided with the batch but is missing from the corpus " +
            s"lookup — the lookup must span EVERY id ever indexed into " +
            s"'$indexTable' (day 1 plus all appended batches), not just " +
            "the original corpus"))))
          .otherwise(col("corpus_text")))
      .withColumn("sim",
        graft.functions.lsh_jaccard(col("batch_text"), col("corpus_text"), ngramWidth))
      .filter(col("sim") > threshold)
      .select("batch_id", "corpus_id", "sim")
  }

  /** Greedy duplicate-cluster assignment: every id maps to the smallest id it
    * is (transitively) connected to in the near-dup pair graph.
    *
    * Adaptive execution: dedup graphs are usually tiny relative to the corpus
    * (edges only between near-dups), so when the edge count is below
    * `driverThreshold` the components are computed with a driver-side
    * union-find — one collect, exact, no iteration. Larger graphs fall back
    * to distributed hash-min iteration (`maxIters` rounds, one shuffle each,
    * lineage truncated per round). */
  def dupClusters(pairs: DataFrame, maxIters: Int = 10,
                  driverThreshold: Long = 1000000L): DataFrame = {
    val spark = pairs.sparkSession
    val edges = pairs.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .localCheckpoint(true)
    if (edges.count() <= driverThreshold) {
      val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
      import spark.implicits._
      return nodes.map(n => (n, find(n))).toSeq.toDF("id", "cluster")
    }
    distributedClusters(edges, maxIters)
  }

  private def distributedClusters(pairs: DataFrame, maxIters: Int): DataFrame = {
    // True hash-min over the RETAINED edge set: each round every node takes
    // the min of its own label and all neighbors' labels. Pointer-jumping
    // alone (label(label(id)) over the initial labels) is NOT enough — with
    // edges (1,3),(2,3) node 2's initial label is 2 and jumping through 2
    // never discovers 1; the component min only propagates along edges.
    // A pointer-jump term is still folded into the same round as an
    // accelerator (label doubling), making convergence O(log diameter).
    // localCheckpoint each round: iterative self-joins otherwise double the
    // lineage per iteration and recompute the whole prefix every action.
    val adj = pairs.select(col("id_a").as("id"), col("id_b").as("peer"))
      .union(pairs.select(col("id_b").as("id"), col("id_a").as("peer")))
      .localCheckpoint(true)
    var labels = adj
      .groupBy("id").agg(least(min(col("peer")), col("id")).as("cluster"))
      .localCheckpoint(true)
    var i = 0
    var converged = false
    while (i < maxIters && !converged) {
      val peerLabels = labels.select(col("id").as("peer"), col("cluster").as("peer_cluster"))
      val neighborMin = adj.join(peerLabels, "peer")
        .groupBy("id").agg(min(col("peer_cluster")).as("nmin"))
      val jump = labels.select(col("id").as("jid"), col("cluster").as("jcluster"))
      val next = labels
        .join(neighborMin, Seq("id"), "left")
        .join(jump, col("cluster") === col("jid"), "left")
        .select(col("id"), col("cluster").as("prev"),
          least(col("cluster"),
            coalesce(col("nmin"), col("cluster")),
            coalesce(col("jcluster"), col("cluster"))).as("cluster"))
        .localCheckpoint(true)
      // convergence check is a scan of the just-materialized round output —
      // no extra join job (the old check re-joined next against labels)
      converged = next.filter(col("cluster") =!= col("prev")).limit(1).count() == 0
      labels = next.select("id", "cluster")
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"dupClusters: hash-min did not converge after $maxIters rounds — labels would be " +
          "silently wrong on this graph; raise maxIters (rounds needed ~ log2 of the largest " +
          "component's diameter thanks to the pointer-jump accelerator)")
    labels
  }

  /** Optional MLlib-backed near-dup join (SURVEY.md §2.5): same
    * `(id_a, id_b, sim)` contract as [[nearDupPairs]] — `id_a < id_b`,
    * `sim > threshold` — but computed with stock
    * `org.apache.spark.ml.feature.MinHashLSH.approxSimilarityJoin` over a
    * `HashingTF(binary)` encoding of the char-n-gram shingle sets. Pipeline:
    * SQL built-ins generate the distinct n-grams (no UDF), `HashingTF` maps
    * them into a 2^`vocabBits` binary term space, `MinHashLSH` with
    * `numHashTables` single-hash tables blocks, and the join's `keyDistance`
    * (exact Jaccard distance over the term space) verifies.
    *
    * NOT bit-compatible with the custom kernels: MLlib's `(a·x+b) mod prime`
    * family shares nothing with the reference's FxHash/ChaCha12 chain
    * (SURVEY §2.5), its tables are 1-row OR-amplification where
    * [[nearDupPairs]] bands AND `bandSize` minima, and `sim` here is Jaccard
    * over HashingTF's hashed term space, where a collision can merge two
    * distinct shingles. Candidates and sims are therefore approximations of
    * the custom path; the spec gates recall against it, not parity. Use this
    * when interoperating with an existing MLlib pipeline (e.g. to reuse a
    * fitted model or compose with other `ml.feature` stages); use
    * [[nearDupPairs]] when reproducibility against the reference matters.
    *
    * Scale shape is the same as the custom path's relational form: one
    * explode of `numHashTables` hash values, one shuffle on (table, hash),
    * ids only through the join. Rows shorter than `ngramWidth` are dropped
    * up front (empty shingle set — same rule as [[bandedRows]]; MLlib
    * additionally requires ≥ 1 non-zero vector entry). */
  def approxJoinMllib(df: DataFrame, idCol: String, textCol: String,
                      ngramWidth: Int, numHashTables: Int, seed: Long,
                      threshold: Double, vocabBits: Int = 18): DataFrame = {
    require(vocabBits >= 1 && vocabBits <= 30,
      s"vocabBits must be in [1, 30], got $vocabBits")
    import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
    val grams = df.filter(length(col(textCol)) >= ngramWidth)
      .select(col(idCol).as("__id"),
        array_distinct(expr(
          s"transform(sequence(1, length($textCol) - ${ngramWidth - 1}), " +
            s"i -> substring($textCol, i, $ngramWidth))")).as("__grams"))
    val featurized = new HashingTF()
      .setInputCol("__grams").setOutputCol("__features")
      .setNumFeatures(1 << vocabBits).setBinary(true)
      .transform(grams)
      .select("__id", "__features")
    val model = new MinHashLSH()
      .setInputCol("__features").setOutputCol("__hashes")
      .setNumHashTables(numHashTables).setSeed(seed)
      .fit(featurized)
    // approxSimilarityJoin keeps pairs with distance < threshold, so the
    // Jaccard-distance cutoff 1 - threshold reproduces sim > threshold with
    // matching strictness
    model.approxSimilarityJoin(featurized, featurized, 1.0 - threshold, "__dist")
      .select(col("datasetA.__id").as("id_a"), col("datasetB.__id").as("id_b"),
        (lit(1.0) - col("__dist")).as("sim"))
      .filter(col("id_a") < col("id_b"))
  }
}
