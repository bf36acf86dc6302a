package graft.queries

import graft.operators.CacheScope
import org.apache.spark.sql.{functions => F}
import Tables.t

/** Wave-20 inventory (r6): multimodal payload analysis — the byte-level
  * operators a 100 TB media-curation pipeline runs between ingest and
  * decode. The reference (flycatcher) validates only structured rows;
  * these extend the F-category plumbing (F1 media meta, F3 frame
  * sampling, F4 perceptual hash) with the per-payload statistics passes
  * that decide whether a blob is even worth decoding: entropy screening
  * (compressed/encrypted vs text), PCM window loudness/clipping, and
  * tiled luma statistics.
  *
  * Decode discipline matches F3/F4: the container has no codecs, so the
  * byte-production step is a deterministic md5-chain stub that both
  * engines compute bit-identically; a real deployment swaps exactly
  * that one expression for a codec call (in the F2 batched
  * mapPartitions shape) and keeps every downstream operator unchanged.
  * All arithmetic is integer-exact (micros) except IEEE-deterministic
  * single sqrt/log2 calls rounded to 6dp per SURVEY §5.
  */
object MediaQueries {

  // ---------------------------------------------------------------- F5
  /** Character-distribution Shannon entropy per document — the cheap
    * "is this payload natural text or compressed/encrypted noise"
    * screen every corpus ingest runs before spending decode/tokenize
    * budget. Distributed shape: explode to (doc, symbol) → ONE
    * map-side-combined count shuffle keyed by (doc_id, ch) → per-doc
    * re-aggregate; state is bounded by alphabet×docs, never corpus
    * bytes. Entropy is published in integer micros: each c·log2(c)
    * term is rounded to micros BEFORE the sum (order-independent
    * integer addition — a double Σ would be partition-order dependent),
    * then H = log2(n) − Σ/n in pure int64. */
  private val payloadEntropy = QueryDef(
    "payload_entropy",
    (s, d) => {
      val ch = t(s, d, "documents")
        .where(F.length(F.col("text")) > 0)
        .select(F.col("doc_id"),
          F.explode(F.split(F.col("text"), "")).as("ch"))
        .where(F.col("ch") =!= "") // Spark split("") keeps a trailing ""
      val cnt = ch.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).as("c"))
      cnt.groupBy("doc_id")
        .agg(F.sum("c").as("n"),
          F.count(F.lit(1)).as("distinct_chars"),
          F.expr("sum(CAST(round(c * log2(c) * 1000000) AS BIGINT))")
            .as("s"))
        .select(F.col("doc_id"), F.col("n"), F.col("distinct_chars"),
          F.expr("CAST(round(log2(n) * 1000000) AS BIGINT) - s div n")
            .as("entropy_micro"))
        .orderBy("doc_id")
    },
    Some("""
      WITH ch AS (
        SELECT doc_id, unnest(string_split(text, '')) AS ch
        FROM documents WHERE length(text) > 0),
      cnt AS (
        SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
        FROM ch WHERE ch != '' GROUP BY 1, 2),
      agg AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS distinct_chars,
               CAST(sum(CAST(round(c * log2(c) * 1000000) AS BIGINT))
                    AS BIGINT) AS s
        FROM cnt GROUP BY 1)
      SELECT doc_id, n, distinct_chars,
             CAST(CAST(round(log2(n) * 1000000) AS BIGINT) - s // n
                  AS BIGINT) AS entropy_micro
      FROM agg ORDER BY doc_id"""))

  // ---------------------------------------------------------------- F6
  /** Windowed PCM loudness/clipping audit over audio-like payloads:
    * 4 windows × 16 signed samples per payload, per-window sum of
    * squares (exact int64), RMS (single IEEE-correctly-rounded sqrt,
    * 6dp), and a peak-based clipping flag. The window explode and the
    * per-window lambda aggregation are NARROW (no shuffle at all —
    * whole-stage codegen end to end); only the final orderBy exchanges.
    * Sample decode is the md5-chain stub (see object doc). */
  private val audioRmsWindows = QueryDef(
    "audio_rms_windows",
    (s, d) => {
      // materialize the sample arrays BELOW the lambda consumers
      // (CollapseProject would otherwise inline the md5 transform into
      // every aggregate element_at — the F4 80× pathology)
      val wins = CacheScope.persist(
        t(s, d, "documents").select(F.col("doc_id"), F.expr(
          "transform(sequence(0, 3), w -> transform(sequence(0, 15), " +
            "k -> CAST(conv(substring(md5(concat(text, '|', " +
            "CAST(w AS STRING))), 1 + 2 * k, 2), 16, 10) AS BIGINT) " +
            "- 128))").as("wins")))
      wins
        .select(F.col("doc_id"),
          F.posexplode(F.col("wins")).as(Seq("wi", "samples")))
        .select(F.col("doc_id"), F.col("wi").cast("long").as("window_idx"),
          F.expr("aggregate(samples, 0L, (acc, x) -> acc + x * x)")
            .as("sumsq"),
          F.expr("aggregate(samples, 0L, (acc, x) -> greatest(acc, abs(x)))")
            .as("peak"))
        .withColumn("rms", F.expr("round(sqrt(sumsq / 16.0), 6)"))
        .withColumn("clipped",
          F.expr("CAST(CASE WHEN peak >= 120 THEN 1 ELSE 0 END AS BIGINT)"))
        .orderBy("doc_id", "window_idx")
    },
    Some("""
      WITH w AS (
        SELECT doc_id, text, unnest(generate_series(0, 3)) AS wi
        FROM documents),
      s AS (
        SELECT doc_id, wi,
               list_transform(generate_series(0, 15), k ->
                 CAST(('0x' || substr(md5(text || '|' ||
                        CAST(wi AS VARCHAR)), 1 + 2 * k, 2)) AS BIGINT)
                 - 128) AS samples
        FROM w),
      a AS (
        SELECT doc_id, CAST(wi AS BIGINT) AS window_idx,
               CAST(list_sum(list_transform(samples, x -> x * x))
                    AS BIGINT) AS sumsq,
               CAST(list_max(list_transform(samples, x -> abs(x)))
                    AS BIGINT) AS peak
        FROM s)
      SELECT doc_id, window_idx, sumsq, peak,
             round(sqrt(sumsq / 16.0), 6) AS rms,
             CAST(CASE WHEN peak >= 120 THEN 1 ELSE 0 END AS BIGINT)
               AS clipped
      FROM a ORDER BY doc_id, window_idx"""))

  // ---------------------------------------------------------------- F7
  /** Tiled luma statistics over image-like payloads: decode to the F4
    * 8×8 grid, split into four 4×4 tiles, publish per-tile min/max and
    * exact-micro mean — the thumbnail-level exposure/contrast profile
    * used to route images (dark/blown-out/flat) before full decode.
    * Pure integer arithmetic (mean = sum × 62500 micros, exact); the
    * tile explode is narrow; pixel arrays are materialized once below
    * the three lambda consumers. */
  private val imageTileStats = QueryDef(
    "image_tile_stats",
    (s, d) => {
      val pxf = CacheScope.persist(
        t(s, d, "documents").select(F.col("doc_id"), F.expr(
          "transform(sequence(0, 63), j -> CAST(conv(substring(" +
            "md5(concat(text, '#', CAST(j div 16 AS STRING))), " +
            "1 + 2 * (j % 16), 2), 16, 10) AS BIGINT))").as("px")))
      pxf
        .select(F.col("doc_id"), F.explode(F.expr(
          "transform(sequence(0, 3), t -> named_struct('t', t, " +
            "'tpx', transform(sequence(0, 15), k -> element_at(px, " +
            "CAST((4 * (t div 2) + k div 4) * 8 + 4 * (t % 2) + " +
            "(k % 4) + 1 AS INT)))))")).as("tile"))
        .select(F.col("doc_id"),
          F.col("tile.t").cast("long").as("tile_idx"),
          F.expr("CAST(tile.t div 2 AS BIGINT)").as("tile_r"),
          F.expr("CAST(tile.t % 2 AS BIGINT)").as("tile_c"),
          F.expr("array_min(tile.tpx)").as("px_min"),
          F.expr("array_max(tile.tpx)").as("px_max"),
          F.expr("aggregate(tile.tpx, 0L, (acc, x) -> acc + x) * 62500")
            .as("mean_micro"))
        .orderBy("doc_id", "tile_idx")
    },
    Some("""
      WITH px AS (
        SELECT doc_id,
               list_transform(generate_series(0, 63), j ->
                 CAST(('0x' || substr(md5(text || '#' ||
                        CAST(j // 16 AS VARCHAR)), 1 + 2 * (j % 16), 2))
                      AS BIGINT)) AS px
        FROM documents),
      t AS (
        SELECT doc_id, unnest(generate_series(0, 3)) AS t, px FROM px),
      tp AS (
        SELECT doc_id, t,
               list_transform(generate_series(0, 15), k ->
                 px[(4 * (t // 2) + k // 4) * 8 + 4 * (t % 2) + (k % 4)
                    + 1]) AS tpx
        FROM t)
      SELECT doc_id, CAST(t AS BIGINT) AS tile_idx,
             CAST(t // 2 AS BIGINT) AS tile_r,
             CAST(t % 2 AS BIGINT) AS tile_c,
             CAST(list_min(tpx) AS BIGINT) AS px_min,
             CAST(list_max(tpx) AS BIGINT) AS px_max,
             CAST(list_sum(tpx) * 62500 AS BIGINT) AS mean_micro
      FROM tp ORDER BY doc_id, tile_idx"""))

  // ------------------------------------------------------- F8/F9 shared
  /** 8-point DCT-II basis quantized ONCE at compile time to integer
    * per-mille-ish units: DCT_T(u)(x) = round(1024·cos((2x+1)uπ/16)).
    * The quantized table IS the algorithm (the C65 discrete-bucket
    * discipline): both engines multiply the same integer weights, so
    * every coefficient — and therefore every sign bit — is exact and
    * identical, with no runtime cos() whose last ULP could differ. */
  private val DCT_T: Seq[Seq[Long]] =
    graft.operators.DctHash.T.map(_.toSeq).toSeq

  /** The 63 non-DC (u,v) coefficients ordered low→high frequency
    * (u+v, then u): bit b of the signature is the SIGN of coefficient
    * COEFF_ORDER(b). */
  private val COEFF_ORDER: Seq[(Int, Int)] =
    graft.operators.DctHash.COEFF_ORDER.toSeq

  /** Planted-near-dup grid parameters: docs group into quads
    * (g = doc_id div 4) sharing a BASE 8×8 md5-stub grid; variant
    * v = doc_id % 4 adds a per-pixel md5 perturbation of amplitude
    * ±v·PHASH_AMP (v = 0 is the pristine anchor). The quad is the
    * ground-truth near-dup family the F9 audit scores against. */
  val PHASH_AMP = 8
  /** Near-dup decision: Hamming over the 63 sign bits ≤ this. */
  val PHASH_HAM = 4
  /** Band layout over the 63 bits: 5 bands (13,13,13,12,12 bits) —
    * pigeonhole-complete for PHASH_HAM = 4 (4 flipped bits cannot
    * touch all 5 bands, so every qualifying pair shares ≥1 exact
    * band key). */
  private val BAND_LOS = Seq(0, 13, 26, 39, 51)
  private val BAND_WIDTHS = Seq(13, 13, 13, 12, 12)

  /** Engine-shared pixel-grid text: 64-element array of [0,255] longs.
    * `q` quotes div; `hex(s)` is the engine's hex-byte extractor. */
  private def pxSql(spark: Boolean): String = {
    require(!spark, "since r14 the Spark side runs DctHash (typed " +
      "batched stage); these generators emit DuckDB oracle text only")
    val (div, cast) = ("//", "AS VARCHAR")
    def hexByte(key: String): String =
      s"CAST(('0x' || substr(md5($key), 1 + 2 * (j % 16), 2)) AS BIGINT)"
    val baseKey =
      s"concat(CAST(doc_id $div 4 $cast), '#', CAST(j $div 16 $cast))"
    val noiseKey =
      s"concat(CAST(doc_id $cast), '!', CAST(j $div 16 $cast))"
    val body =
      s"""least(CAST(255 AS BIGINT), greatest(CAST(0 AS BIGINT),
         |${hexByte(baseKey)}
         |+ CASE WHEN doc_id % 4 = 0 THEN CAST(0 AS BIGINT) ELSE
         |  ${hexByte(noiseKey)}
         |  % (2 * (doc_id % 4) * $PHASH_AMP + 1)
         |  - (doc_id % 4) * $PHASH_AMP END))""".stripMargin
    s"list_transform(generate_series(0, 63), j -> $body)"
  }

  /** FACTORED 2-D DCT, pass 1 (r14 perf: the separable row transform):
    * rt[x·8 + v] = Σ_y px[x·8 + y] · T(v, y) as a 64-entry array of
    * EXPLICIT 8-term integer sums — no lambda HOFs, so the whole pass
    * compiles into whole-stage codegen. Factoring Σ_xy px·T(u,x)·T(v,y)
    * into Σ_x T(u,x)·(Σ_y px·T(v,y)) is exact integer algebra (same
    * products, associative addition), so every sign bit — and every
    * committed output — is IDENTICAL to the direct form at ~4× fewer
    * multiplies (1016 vs 4032 per grid; frame_scene_cuts 21.6 → ~6 s
    * at sf0.1). */
  private def rtSql(spark: Boolean): String = {
    require(!spark)
    def pxAt(k: Int): String = s"px[${k + 1}]" // k is 0-based
    val entries = (0 until 64).map { i =>
      val x = i / 8; val v = i % 8
      (0 until 8).map(y => s"${DCT_T(v)(y)} * ${pxAt(x * 8 + y)}")
        .mkString("(", " + ", ")")
    }
    entries.mkString("[", ",\n ", "]")
  }

  /** Engine-shared 63-bit DCT sign-pack text over the [[rtSql]] `rt`
    * column: bit b set iff Σ_x T(u, x) · rt[x·8 + v] > 0 — the second
    * separable pass, again explicit 8-term sums. */
  private def sigSql(spark: Boolean): String = {
    require(!spark)
    def rtAt(k: Int): String = s"rt[${k + 1}]" // k is 0-based
    val terms = COEFF_ORDER.zipWithIndex.map { case ((u, v), b) =>
      val dot = (0 until 8)
        .map(x => s"${DCT_T(u)(x)} * ${rtAt(x * 8 + v)}")
        .mkString("(", " + ", ")")
      s"CASE WHEN $dot > 0 THEN CAST(${1L << b} AS BIGINT) " +
        "ELSE CAST(0 AS BIGINT) END"
    }
    terms.mkString("(", "\n + ", ")")
  }

  // ---------------------------------------------------------------- F8
  /** DCT perceptual-hash near-dup detection over the grayscale grids —
    * the classical pHash pipeline made engine-exact: 8×8 luma grid →
    * integer 2-D DCT-II with the compile-time [[DCT_T]] table → 63-bit
    * LOW-FREQUENCY SIGN PACK (one BIGINT per doc, the D69 sign-pack
    * shape) → banded exact-match blocking (5 bands over the 63 bits;
    * pigeonhole-complete for Hamming ≤ [[PHASH_HAM]]) → per-candidate
    * Hamming via bit_count(xor). Publishes every pair with Hamming ≤
    * PHASH_HAM. Unlike F4's average-hash negative control, the grid
    * generator PLANTS near-dup quads (shared base + graded
    * perturbation), so detection has real signal and F9 can measure
    * recall against exact pixel distance.
    *
    * Scale shape: the signature build runs as the F2 batched typed
    * stage ([[graft.operators.DctHash]] mapPartitions — tight
    * primitive loops, one digest per grid row, narrow/no shuffle;
    * r14: the equivalent Catalyst expression tree exceeded janino's
    * 64 KB whole-stage-codegen method limit and silently fell back to
    * interpreted, 4× slower); blocking ships 5 band rows per doc and
    * joins on exact (band, key) — a 2⁻¹²·⁶-selective key, so
    * candidates stay ~10⁻³ of the pair space; the Hamming check is
    * one xor+popcount per candidate. Real deployment swaps the md5
    * grid stub for a decode-resize inside the SAME mapPartitions and
    * keeps everything downstream unchanged. */
  private val phashDct = QueryDef(
    "phash_dct",
    (s, d) => {
      val sig = CacheScope.persist(graft.operators.DctHash.docSigs(
        t(s, d, "documents"), "doc_id", PHASH_AMP))
      val bands = sig.select(F.col("doc_id"), F.col("sig"),
        F.explode(F.expr(
          BAND_LOS.zip(BAND_WIDTHS).zipWithIndex.map {
            case ((lo, w), i) =>
              s"named_struct('band', $i, 'key', " +
                s"(sig div CAST(${1L << lo} AS BIGINT)) % " +
                s"CAST(${1L << w} AS BIGINT))"
          }.mkString("array(", ", ", ")"))).as("b"))
        .select(F.col("doc_id"), F.col("sig"),
          F.col("b.band").as("band"), F.col("b.key").as("key"))
      val a = bands.toDF("doc_a", "sig_a", "band", "key")
      val b = bands.toDF("doc_b", "sig_b", "band", "key")
      a.join(b, Seq("band", "key"))
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(F.col("doc_a"), F.col("doc_b"),
          F.expr("bit_count(sig_a ^ sig_b)").cast("long").as("hamming"))
        .distinct()
        .where(F.col("hamming") <= PHASH_HAM)
        .orderBy("doc_a", "doc_b")
    },
    Some(s"""
      WITH sig AS MATERIALIZED (
        SELECT doc_id, ${sigSql(spark = false)} AS sig
        FROM (SELECT doc_id, ${rtSql(spark = false)} AS rt
              FROM (SELECT doc_id, ${pxSql(spark = false)} AS px
                    FROM documents))),
      bands AS (
        SELECT doc_id, sig, b.i AS band,
               (sig // CAST(${BAND_LOS.map(l => 1L << l)
                 .mkString("[", ",", "]")}[b.i + 1] AS BIGINT))
               % CAST(${BAND_WIDTHS.map(w => 1L << w)
                 .mkString("[", ",", "]")}[b.i + 1] AS BIGINT) AS key
        FROM sig, (SELECT unnest(generate_series(0, 4)) AS i) b),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(CAST(a.sig AS UBIGINT),
                                  CAST(b.sig AS UBIGINT))) AS BIGINT)
                 AS hamming
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
      SELECT doc_a, doc_b, hamming FROM cand
      WHERE hamming <= $PHASH_HAM ORDER BY doc_a, doc_b"""))

  // ---------------------------------------------------------------- F9
  /** Honesty audit of the F8 detector against EXACT pixel distance on
    * a bounded cohort (the D61/D68 audit pattern — the audit pays the
    * exact all-pixels cost on a deterministic slice, the serving query
    * never does): for families g ≡ 0 (mod 17), every within-quad pair
    * gets its exact squared-L2 pixel distance (integer, 64 diffs) and
    * its 63-bit signature Hamming; published per (variant_a,
    * variant_b) bucket — the planted perturbation amplitude — with
    * pair count, detected count (Hamming ≤ PHASH_HAM), recall in ppm,
    * exact summed L2 and its per-pair mean. The graded read: recall
    * near 1 at ±8 perturbation, decaying toward the ±24 variants
    * whose pixel distance has genuinely left near-dup territory. */
  private val phashDctRecall = QueryDef(
    "phash_dct_recall",
    (s, d) => {
      val sigd = CacheScope.persist(graft.operators.DctHash.docGrids(
        t(s, d, "documents").where(F.expr("(doc_id div 4) % 17 = 0")),
        "doc_id", PHASH_AMP))
      val a = sigd.toDF("doc_a", "g", "va", "px_a", "sig_a")
      val b = sigd.toDF("doc_b", "g", "vb", "px_b", "sig_b")
      a.join(b, "g").where(F.col("doc_a") < F.col("doc_b"))
        .select(F.col("va"), F.col("vb"),
          F.expr("aggregate(zip_with(px_a, px_b, " +
            "(x, y) -> (x - y) * (x - y)), CAST(0 AS BIGINT), " +
            "(acc, z) -> acc + z)").as("_l2"),
          F.expr("bit_count(sig_a ^ sig_b)").cast("long").as("_h"))
        .groupBy("va", "vb")
        .agg(F.count(F.lit(1)).as("n_pairs"),
          F.sum(F.expr(s"CASE WHEN _h <= $PHASH_HAM THEN 1 ELSE 0 END"))
            .as("n_detected"),
          F.sum("_l2").as("sum_l2"))
        .select(F.col("va"), F.col("vb"), F.col("n_pairs"),
          F.col("n_detected"),
          F.expr("n_detected * 1000000 div n_pairs").as("recall_ppm"),
          F.col("sum_l2"),
          F.expr("round(CAST(sum_l2 AS DOUBLE) / n_pairs, 2)")
            .as("mean_l2"))
        .orderBy("va", "vb")
    },
    Some(s"""
      WITH cohort AS MATERIALIZED (
        SELECT doc_id, doc_id // 4 AS g, doc_id % 4 AS v,
               ${pxSql(spark = false)} AS px
        FROM documents WHERE (doc_id // 4) % 17 = 0),
      sigd AS MATERIALIZED (
        SELECT doc_id, g, v, px, ${sigSql(spark = false)} AS sig
        FROM (SELECT *, ${rtSql(spark = false)} AS rt FROM cohort)),
      pairs AS (
        SELECT a.v AS va, b.v AS vb,
               CAST(list_sum(list_transform(generate_series(1, 64),
                 i -> (a.px[i] - b.px[i]) * (a.px[i] - b.px[i])))
                 AS BIGINT) AS l2,
               bit_count(xor(CAST(a.sig AS UBIGINT),
                             CAST(b.sig AS UBIGINT))) AS h
        FROM sigd a JOIN sigd b
          ON a.g = b.g AND a.doc_id < b.doc_id)
      SELECT va, vb, CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CASE WHEN h <= $PHASH_HAM THEN 1 ELSE 0 END)
               AS BIGINT) AS n_detected,
             CAST(sum(CASE WHEN h <= $PHASH_HAM THEN 1 ELSE 0 END)
               * 1000000 // count(*) AS BIGINT) AS recall_ppm,
             CAST(sum(l2) AS BIGINT) AS sum_l2,
             round(CAST(CAST(sum(l2) AS BIGINT) AS DOUBLE) / count(*), 2)
               AS mean_l2
      FROM pairs GROUP BY 1, 2 ORDER BY 1, 2"""))

  // --------------------------------------------------------------- F10
  /** Shot-boundary (scene-cut) detection over video-like payloads —
    * the standard consecutive-frame perceptual-distance algorithm on
    * the F3 frame model: each document's payload yields up to
    * [[SCENE_FRAMES]] frames, every frame decodes to an 8×8 luma grid
    * (md5 stub PLANTING 4-frame scenes: frames share a base grid per
    * scene = frame_idx div 4, plus ±6 per-frame noise; 32-byte
    * frames so the synthetic payload lengths yield multi-scene clips), each grid
    * sign-packs through the SAME compile-time integer DCT as F8, and a
    * CUT is a consecutive-frame signature Hamming > [[CUT_HAM]] —
    * within-scene noise stays in single digits, a scene boundary sits
    * near the random-pair mean (~31 of 63 bits). Publishes every cut
    * with its Hamming and the frame count — the shot index a video
    * curation pipeline builds before sampling training clips.
    *
    * Scale shape: frames explode ≤ SCENE_FRAMES per doc (bounded
    * fan-out), the signature is the F8 narrow codegen pass, and the
    * consecutive pairing is a lag window PARTITIONED by doc (never
    * global). Real deployment swaps the md5 grid for a decoded frame
    * in F2's batched shape; everything downstream is unchanged. */
  val SCENE_FRAMES = 12
  val CUT_HAM = 10

  /** Frame pixel grid: base keyed on (doc, scene, row), noise keyed on
    * (doc, frame, row) at amplitude ±6 — engine-shared text. */
  private def framePxSql(spark: Boolean): String = {
    require(!spark)
    val (div, cast) = ("//", "AS VARCHAR")
    def hexByte(key: String): String =
      s"CAST(('0x' || substr(md5($key), 1 + 2 * (j % 16), 2)) AS BIGINT)"
    val baseKey = s"concat(CAST(doc_id $cast), '@', " +
      s"CAST(fi $div 4 $cast), '#', CAST(j $div 16 $cast))"
    val noiseKey = s"concat(CAST(doc_id $cast), '@', CAST(fi $cast), " +
      s"'!', CAST(j $div 16 $cast))"
    val body =
      s"""least(CAST(255 AS BIGINT), greatest(CAST(0 AS BIGINT),
         |${hexByte(baseKey)} + ${hexByte(noiseKey)} % 13 - 6))"""
        .stripMargin
    s"list_transform(generate_series(0, 63), j -> $body)"
  }

  private val frameSceneCuts = QueryDef(
    "frame_scene_cuts",
    (s, d) => {
      val frames = t(s, d, "documents")
        .select(F.col("doc_id"),
          F.expr(s"least($SCENE_FRAMES, " +
            "CAST(ceil(CAST(length(text) AS DOUBLE) / 32) AS BIGINT))")
            .as("nf"))
        .where(F.col("nf") >= 2)
        .select(F.col("doc_id"), F.col("nf"),
          F.explode(F.expr("sequence(0L, nf - 1)")).as("fi"))
      val sigs = graft.operators.DctHash.frameSigs(frames)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("fi")
      sigs
        .withColumn("_prev", F.lag("sig", 1).over(w))
        .where(F.col("_prev").isNotNull)
        .withColumn("hamming",
          F.expr("bit_count(sig ^ _prev)").cast("long"))
        .where(F.col("hamming") > CUT_HAM)
        .select(F.col("doc_id"), F.col("fi").as("cut_at_frame"),
          F.col("nf").as("n_frames"), F.col("hamming"))
        .orderBy("doc_id", "cut_at_frame")
    },
    Some(s"""
      WITH nfd AS (
        SELECT doc_id,
               least($SCENE_FRAMES,
                 CAST(ceil(CAST(length(text) AS DOUBLE) / 32) AS BIGINT))
                 AS nf
        FROM documents),
      frames AS (
        SELECT doc_id, nf, unnest(generate_series(0, nf - 1)) AS fi
        FROM nfd WHERE nf >= 2),
      sigs AS MATERIALIZED (
        SELECT doc_id, nf, fi, ${sigSql(spark = false)} AS sig
        FROM (SELECT doc_id, nf, fi, ${rtSql(spark = false)} AS rt
              FROM (SELECT doc_id, nf, fi,
                           ${framePxSql(spark = false)} AS px
                    FROM frames))),
      lagged AS (
        SELECT doc_id, fi, nf, sig,
               lag(sig) OVER (PARTITION BY doc_id ORDER BY fi) AS prev
        FROM sigs)
      SELECT doc_id, CAST(fi AS BIGINT) AS cut_at_frame,
             CAST(nf AS BIGINT) AS n_frames,
             CAST(bit_count(xor(CAST(sig AS UBIGINT),
                                CAST(prev AS UBIGINT))) AS BIGINT)
               AS hamming
      FROM lagged
      WHERE prev IS NOT NULL
        AND bit_count(xor(CAST(sig AS UBIGINT), CAST(prev AS UBIGINT)))
            > $CUT_HAM
      ORDER BY doc_id, cut_at_frame"""))

  // ----------------------------------------------------- F11/F12 shared
  /** Video near-dup model: videos quad into groups (g = doc_id div 4)
    * and variant v = doc_id % 4 REPLACES its first v scenes with
    * video-unique content — scene s ≥ v is a bit-identical COPY of the
    * group's clip (shared segments are pasted bytes, the copied-clip
    * editing model), scene s < v is doc-keyed. Engine-shared pixel
    * text; the Spark side runs [[graft.operators.DctHash.videoPx]]. */
  private def videoPxSql(spark: Boolean): String = {
    require(!spark)
    val (div, cast) = ("//", "AS VARCHAR")
    def hexByte(key: String): String =
      s"CAST(('0x' || substr(md5($key), 1 + 2 * (j % 16), 2)) AS BIGINT)"
    val sharedCond = s"fi $div 4 >= doc_id % 4"
    def keyed(mid: String, sep: String): String =
      s"""CASE WHEN $sharedCond
         |  THEN ${hexByte(s"concat(CAST(doc_id $div 4 $cast), '&', $mid, " +
        s"'$sep', CAST(j $div 16 $cast))")}
         |  ELSE ${hexByte(s"concat(CAST(doc_id $cast), '~', $mid, " +
        s"'$sep', CAST(j $div 16 $cast))")} END""".stripMargin
    val base = keyed(s"CAST(fi $div 4 $cast)", "#")
    val noise = keyed(s"CAST(fi $cast)", "!")
    val body =
      s"""least(CAST(255 AS BIGINT), greatest(CAST(0 AS BIGINT),
         |$base + ($noise) % 13 - 6))""".stripMargin
    s"list_transform(generate_series(0, 63), j -> $body)"
  }

  /** Keyframe-signature selection threshold (the F10 cut rule) and the
    * D5-style document-frequency cap on the inverted index: a keyframe
    * signature shared by more than this many videos is a "stop clip"
    * (intro cards, test patterns) — joined on, it would fan out by
    * df², so it is dropped from CANDIDATE GENERATION (in-model df ≤ 4,
    * so nothing real is lost; at 100 TB this cap is what bounds the
    * self-join). Containment τ = ⅓: a pair is near-dup when it shares
    * at least a third of the smaller video's keyframe set — the
    * clip-level threshold that grades three variant buckets of the
    * planted quad structure instead of only adjacent variants. */
  val VIDEO_DF_CAP = 8

  private def videoFramesDf(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    t(s, d, "documents")
      .select(F.col("doc_id"),
        F.expr(s"least($SCENE_FRAMES, " +
          "CAST(ceil(CAST(length(text) AS DOUBLE) / 32) AS BIGINT))")
          .as("nf"))
      .where(F.col("nf") >= 2)
      .select(F.col("doc_id"), F.col("nf"),
        F.explode(F.expr("sequence(0L, nf - 1)")).as("fi"))

  /** Per-video DISTINCT keyframe-signature set: frame 0 plus every
    * F10-detected scene cut. */
  private def keyframeSigs(
      sigs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("fi")
    sigs.withColumn("_prev", F.lag("sig", 1).over(w))
      .where(F.col("_prev").isNull ||
        F.expr(s"bit_count(sig ^ _prev) > $CUT_HAM"))
      .select("doc_id", "sig").distinct()
  }

  /** Engine-shared CTE chain: frames → sig → lag → distinct keyframe
    * sets → size k per video → df-capped inverted index → shared-sig
    * counts per pair. `cohort` optionally restricts the corpus. */
  private def videoDetectSql(cohort: String): String = s"""
      nfd AS (
        SELECT doc_id,
               least($SCENE_FRAMES,
                 CAST(ceil(CAST(length(text) AS DOUBLE) / 32) AS BIGINT))
                 AS nf
        FROM documents$cohort),
      vids AS (SELECT doc_id, nf, doc_id // 4 AS g, (nf + 3) // 4 AS ns
               FROM nfd WHERE nf >= 2),
      frames AS (
        SELECT doc_id, nf, unnest(generate_series(0, nf - 1)) AS fi
        FROM vids),
      sigs AS MATERIALIZED (
        SELECT doc_id, fi, ${sigSql(spark = false)} AS sig
        FROM (SELECT doc_id, fi, ${rtSql(spark = false)} AS rt
              FROM (SELECT doc_id, fi, ${videoPxSql(spark = false)} AS px
                    FROM frames))),
      lagged AS (
        SELECT doc_id, fi, sig,
               lag(sig) OVER (PARTITION BY doc_id ORDER BY fi) AS prev
        FROM sigs),
      kf AS (
        SELECT DISTINCT doc_id, sig FROM lagged
        WHERE prev IS NULL
           OR bit_count(xor(CAST(sig AS UBIGINT), CAST(prev AS UBIGINT)))
              > $CUT_HAM),
      k AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS k
            FROM kf GROUP BY 1),
      dfc AS (SELECT sig FROM (SELECT sig, count(*) AS c FROM kf
                               GROUP BY 1) WHERE c <= $VIDEO_DF_CAP),
      idx AS (SELECT kf.doc_id, kf.sig FROM kf JOIN dfc USING (sig)),
      shared AS (
        SELECT a.doc_id AS video_a, b.doc_id AS video_b,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM idx a JOIN idx b
          ON a.sig = b.sig AND a.doc_id < b.doc_id
        GROUP BY 1, 2)"""

  // --------------------------------------------------------------- F11
  /** VIDEO-level near-duplicate detection — the composition the r14
    * verdict asked for (F10 scene cuts × F8 DCT signatures × the D5
    * df-capped inverted-index discipline): per video, the keyframe set
    * is frame 0 plus every detected scene cut; each keyframe carries
    * its 63-bit integer-DCT sign signature; two videos are near-dups
    * when they SHARE at least a third of the smaller keyframe-signature
    * set (exact-match containment — shared scenes are pasted clip
    * bytes, so their keyframe signatures collide exactly; re-noised
    * content does not). Publishes (video_a, video_b, n_shared, k_a,
    * k_b, contain_ppm).
    *
    * Scale shape: the signature pass is the F2 batched typed stage
    * (narrow); the cut window is partitioned per video; candidate
    * generation is an inverted-index self-join on the signature with
    * the document-frequency cap [[VIDEO_DF_CAP]] bounding fan-out to
    * df² per signature — videos², the thing that kills video dedup at
    * 100 TB, is never formed. The containment join touches per-video
    * metadata (keyframe counts), not frames. */
  private val videoNeardup = QueryDef(
    "video_neardup",
    (s, d) => {
      val kf = CacheScope.persist(keyframeSigs(
        graft.operators.DctHash.videoSigs(videoFramesDf(s, d))))
      val k = kf.groupBy("doc_id").agg(F.count(F.lit(1)).as("k"))
      val dfc = kf.groupBy("sig").agg(F.count(F.lit(1)).as("_c"))
        .where(F.col("_c") <= VIDEO_DF_CAP).select("sig")
      val idx = kf.join(dfc, "sig")
      val a = idx.select(F.col("sig"), F.col("doc_id").as("video_a"))
      val b = idx.select(F.col("sig"), F.col("doc_id").as("video_b"))
      a.join(b, "sig").where(F.col("video_a") < F.col("video_b"))
        .groupBy("video_a", "video_b")
        .agg(F.count(F.lit(1)).as("n_shared"))
        .join(k.select(F.col("doc_id").as("video_a"), F.col("k").as("k_a")),
          "video_a")
        .join(k.select(F.col("doc_id").as("video_b"), F.col("k").as("k_b")),
          "video_b")
        .where(F.expr("3 * n_shared >= least(k_a, k_b)"))
        .select(F.col("video_a"), F.col("video_b"), F.col("n_shared"),
          F.col("k_a"), F.col("k_b"),
          F.expr("n_shared * 1000000 div least(k_a, k_b)")
            .as("contain_ppm"))
        .orderBy("video_a", "video_b")
    },
    Some(s"""
      WITH ${videoDetectSql(cohort = "")}
      SELECT video_a, video_b, n_shared, ka.k AS k_a, kb.k AS k_b,
             CAST(n_shared * 1000000 // least(ka.k, kb.k) AS BIGINT)
               AS contain_ppm
      FROM shared
           JOIN k ka ON ka.doc_id = video_a
           JOIN k kb ON kb.doc_id = video_b
      WHERE 3 * n_shared >= least(ka.k, kb.k)
      ORDER BY video_a, video_b"""))

  // --------------------------------------------------------------- F12
  /** Honesty audit of F11 against EXACT pixel truth on a bounded
    * cohort (groups g ≡ 0 mod 17 — the F9/D61 discipline): ground
    * truth for a same-group pair is the count of scene indices whose
    * SCENE-START frames are pixel-identical in both videos (the plant:
    * shared scenes are pasted bytes), a pair is TRULY near-dup when
    * 3·t ≥ min scene count — the detector's τ applied to the truth;
    * the detector (keyframes → df-capped containment) runs on the same
    * cohort and is scored against it. Published per (variant_a,
    * variant_b) bucket: pair count, true near-dups, detected true
    * near-dups, recall ppm. The graded read: recall ≈ 1 on low-variant
    * pairs (big shared suffixes), truth count falling to 0 as variants
    * replace every shared scene. Recall < 1 can only come from missed
    * cuts (a scene boundary whose Hamming ≤ $CUT_HAM) — measured, not
    * assumed. */
  private val videoNeardupRecall = QueryDef(
    "video_neardup_recall",
    (s, d) => {
      val frames = videoFramesDf(s, d)
        .where(F.expr("(doc_id div 4) % 17 = 0"))
      val vids = frames.select("doc_id", "nf").distinct()
        .select(F.col("doc_id"), F.expr("doc_id div 4").as("g"),
          F.expr("(nf + 3) div 4").as("ns"))
      val kf = CacheScope.persist(keyframeSigs(
        graft.operators.DctHash.videoSigs(frames)))
      val k = kf.groupBy("doc_id").agg(F.count(F.lit(1)).as("k"))
      val dfc = kf.groupBy("sig").agg(F.count(F.lit(1)).as("_c"))
        .where(F.col("_c") <= VIDEO_DF_CAP).select("sig")
      val idx = kf.join(dfc, "sig")
      val det = idx.select(F.col("sig"), F.col("doc_id").as("va_id"))
        .join(idx.select(F.col("sig"), F.col("doc_id").as("vb_id")), "sig")
        .where(F.col("va_id") < F.col("vb_id"))
        .groupBy("va_id", "vb_id")
        .agg(F.count(F.lit(1)).as("n_shared"))
        .join(k.select(F.col("doc_id").as("va_id"), F.col("k").as("k_a")),
          "va_id")
        .join(k.select(F.col("doc_id").as("vb_id"), F.col("k").as("k_b")),
          "vb_id")
        .where(F.expr("3 * n_shared >= least(k_a, k_b)"))
        .select(F.col("va_id"), F.col("vb_id"), F.lit(1L).as("_det"))
      // exact truth: scene-start grids, pixel-identical across the pair
      val grids = graft.operators.DctHash.videoGrids(
        frames.where(F.expr("fi % 4 = 0")))
      val sm = grids.select(F.col("doc_id").as("va_id"),
          F.expr("doc_id div 4").as("g"), F.col("fi"), F.col("px"))
        .join(grids.select(F.col("doc_id").as("vb_id"),
          F.expr("doc_id div 4").as("g"), F.col("fi"),
          F.col("px").as("px_b")), Seq("g", "fi"))
        .where(F.col("va_id") < F.col("vb_id") &&
          F.col("px") === F.col("px_b"))
        .groupBy("va_id", "vb_id").agg(F.count(F.lit(1)).as("_t"))
      val pairs = vids.select(F.col("doc_id").as("va_id"), F.col("g"),
          F.col("ns").as("ns_a"))
        .join(vids.select(F.col("doc_id").as("vb_id"), F.col("g"),
          F.col("ns").as("ns_b")), "g")
        .where(F.col("va_id") < F.col("vb_id"))
        .join(sm, Seq("va_id", "vb_id"), "left").na.fill(0L, Seq("_t"))
        .join(det, Seq("va_id", "vb_id"), "left").na.fill(0L, Seq("_det"))
        .select(F.expr("va_id % 4").as("va"), F.expr("vb_id % 4").as("vb"),
          F.expr("CASE WHEN 3 * _t >= least(ns_a, ns_b) THEN 1 ELSE 0 END")
            .as("_true"),
          F.col("_det"))
      pairs.groupBy("va", "vb")
        .agg(F.count(F.lit(1)).as("n_pairs"),
          F.sum("_true").as("n_true"),
          F.sum(F.expr("_true * _det")).as("n_detected"))
        .select(F.col("va"), F.col("vb"), F.col("n_pairs"),
          F.col("n_true"), F.col("n_detected"),
          F.expr("CASE WHEN n_true > 0 THEN n_detected * 1000000 div n_true " +
            "ELSE 0 END").as("recall_ppm"))
        .orderBy("va", "vb")
    },
    Some(s"""
      WITH ${videoDetectSql(cohort = " WHERE (doc_id // 4) % 17 = 0")},
      det AS (
        SELECT video_a AS va_id, video_b AS vb_id
        FROM shared
             JOIN k ka ON ka.doc_id = video_a
             JOIN k kb ON kb.doc_id = video_b
        WHERE 3 * n_shared >= least(ka.k, kb.k)),
      sgrids AS MATERIALIZED (
        SELECT doc_id, doc_id // 4 AS g, fi,
               ${videoPxSql(spark = false)} AS px
        FROM frames WHERE fi % 4 = 0),
      sm AS (
        SELECT a.doc_id AS va_id, b.doc_id AS vb_id,
               CAST(count(*) AS BIGINT) AS t
        FROM sgrids a JOIN sgrids b
          ON a.g = b.g AND a.fi = b.fi AND a.doc_id < b.doc_id
             AND a.px = b.px
        GROUP BY 1, 2),
      pr AS (
        SELECT a.doc_id % 4 AS va, b.doc_id % 4 AS vb,
               CASE WHEN 3 * coalesce(sm.t, 0) >= least(a.ns, b.ns)
                    THEN 1 ELSE 0 END AS tr,
               CASE WHEN d.va_id IS NOT NULL THEN 1 ELSE 0 END AS det
        FROM vids a
             JOIN vids b ON a.g = b.g AND a.doc_id < b.doc_id
             LEFT JOIN sm ON sm.va_id = a.doc_id AND sm.vb_id = b.doc_id
             LEFT JOIN det d ON d.va_id = a.doc_id AND d.vb_id = b.doc_id)
      SELECT va, vb, CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(tr) AS BIGINT) AS n_true,
             CAST(sum(tr * det) AS BIGINT) AS n_detected,
             CAST(CASE WHEN sum(tr) > 0
                  THEN sum(tr * det) * 1000000 // sum(tr)
                  ELSE 0 END AS BIGINT) AS recall_ppm
      FROM pr GROUP BY 1, 2 ORDER BY 1, 2"""))

  val all: Seq[QueryDef] = Seq(payloadEntropy, audioRmsWindows,
    imageTileStats, phashDct, phashDctRecall, frameSceneCuts,
    videoNeardup, videoNeardupRecall)
}
