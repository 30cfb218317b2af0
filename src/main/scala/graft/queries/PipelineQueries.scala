package graft.queries

import graft.operators.{Classifier, Curation, Dedup, Multimodal, Packing, Sampling, Similarity, TextAnalysis, Unigram, ZOrder}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators (BASELINE.json north star):
  * dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), text analysis,
  * embedding similarity search, multimodal binary plumbing — each with a
  * DuckDB oracle built from the exact same formulas (md5/sha256-based
  * hashing and sequential double folds are bit-identical across engines).
  */
object PipelineQueries {

  private val K = 8            // minhash signature width
  private val BANDS = 4        // LSH bands (2 rows per band)
  private val EST_K = 64       // d27/d29 estimation signature width
  private val EST_BANDS = 16   // d27/d29 LSH bands (4 rows per band)
  private val LEX_KNN_K = 3    // d29 neighbors per document
  private val SIMHASH_RADIUS = 3 // d30 Hamming radius (→ 4 16-bit blocks)
  private val ANN_BITS = 6     // sign-projection bits → 64 buckets
  private val MAX_BUCKET = 1000L // LSH bucket-size guard (Dedup.lshCandidates)
  private val MAX_DF = 10000L    // stop-shingle df guard (Dedup.dfCapped)
  private val CONTAIN_T = 0.5    // d139 containment threshold
  private val SRC_OVERLAP_T = 0.08 // d152 source-overlap threshold
  private val IVF_CELLS = 16     // IVF centroid count (e04)
  private val IVF_PROBES = 4     // IVF probed cells per query (e04)
  private val PQ_M = 8           // e09/e10 PQ subspaces
  private val PQ_KS = 16         // e09/e10 sub-codebook size
  private val PQ_K = 3           // e10 neighbors per query
  private val RERANK_SHORTLIST = 12 // e20 ADC shortlist depth (4×PQ_K)
  private val WINNOW_W = 4       // d33 winnowing window (grams per window)
  private val WINNOW_MIN_SHARED = 2L // d34: pairs need ≥2 shared fps (1 = chance collisions — measured)
  private val WINNOW_MAX_DF = 1000L  // d34 boilerplate-fingerprint cap
  private val EXSUB_LEN = 8      // d40/d41 ExactSubstr min duplicated run (words)
  private val PROBE_CURVE = Seq(1, 2, 4, 8, 16) // e30 sweep; 16 = IVF_CELLS = full coverage
  private val PQ_DIMS = 64       // embedding width (TESTDATA.md) — the
                                 // oracle's distance chains are generated
                                 // per-dimension, so the width is static here

  private val BM25_TERMS = Seq("table", "query", "spark") // d17 query terms
  // d89 retrieval workload: three queries of different selectivity over
  // the corpus vocabulary (first = d17's terms, so the scoring leg is
  // the proven chain verbatim)
  private val BM25_QUERIES =
    Seq(BM25_TERMS, Seq("hash", "join"), Seq("vector", "stream", "scan"))
  private val BM25_TOPK = 20
  private val SEMDEDUP_T = 0.35  // e45 within-cluster cosine threshold
                                 // (drops 61/500 at sf0.01 — measured;
                                 // real corpora use ~0.95+)
  private val BPE_TOPK = 50      // d58 merge-candidate table depth
  private val BPE_MERGES = 5     // d59 training iterations
  private val KCENTER_K = 8      // e47 selected exemplar count
  private val LM_SCALE = 16      // d46 rank-bucket grid: floor(avg_nll*16)
  private val SRP_DIMS = 16      // e35 sign-random-projection output dims
  private val SRP_RADIUS = 3     // e39 Hamming radius → 4 sign-bit blocks
  private val SRP_RADII = Seq(1, 3, 7, 15) // e44 coverage curve (nested blocks)
  private val SHARD_BUDGET = 4096L // d47 tokens per shard
  private val CTX_LEN = 128      // d48 context-window length (tokens)
  private val CLS_BUCKETS = 64   // d68 hashed-feature buckets (+1 bias)
  private val CLS_PASSES = 3     // d68 batch-perceptron training passes

  /** Stable on-disk home for the persisted-index queries (d44/e31/e32/
    * e33): a FIXED path under target/ that each run overwrites, so
    * repeated bench/verify invocations reuse one slot instead of
    * leaking a fresh temp directory per run — the registered queries
    * stay idempotent on disk as well as in result.
    */
  private def indexPath(name: String): String = {
    val f = new java.io.File(s"target/graft-indexes/$name")
    f.getParentFile.mkdirs()
    f.getAbsolutePath
  }

  /** The d19 verdict through its persisted-artifact cache, one slot per
    * data directory (sf0.001 and sf0.01 corpora must not thrash one
    * slot — their watermarks differ, so a shared path would rebuild on
    * every alternation).
    */
  private def keepCached(spark: SparkSession, dir: String) =
    Curation.keepListCached(Tables.documents(spark, dir),
      col("doc_id") % 10 === 0, SAMPLE_RATES.toMap, SAMPLE_DEFAULT,
      K, BANDS, 0.5, MAX_BUCKET, MAX_DF,
      indexPath("d19-keep/" + dir.replaceAll("[^A-Za-z0-9._-]", "_")))

  /** The d85 full verdict through ITS persisted-artifact cache (one
    * slot per data dir, the keepCached convention): d85 and d88 both
    * read this one store — whichever runs first pays the build.
    */
  private def verdictCached(spark: SparkSession, dir: String) = {
    val slug = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    Curation.fullVerdictCached(Tables.documents(spark, dir),
      col("doc_id") % 10 === 0, SAMPLE_RATES.toMap, SAMPLE_DEFAULT,
      K, BANDS, 0.5, MAX_BUCKET, MAX_DF,
      LM_SCALE, col("lang") === "en", CLS_BUCKETS, CLS_PASSES,
      indexPath("d19-keep/" + slug), indexPath("d85-verdict/" + slug))
  }

  /** The TRAINED-quantizer persisted IVF+SQ8 store e77/e78 serve from —
    * one idempotent slot per data dir (the keepCached convention):
    * whichever consumer runs first pays the k-center-seeded Lloyd
    * training + encode; a fresh matching store is reused as-is. "cells"
    * is deliberately NOT pinned here — dead centroids may drop during
    * training, and the surviving count is the store's to record.
    */
  private def trainedIvfStore(spark: SparkSession, dir: String): String = {
    import graft.sources.{IndexManifest, IndexManifestException}
    val emb = Tables.embeddings(spark, dir)
    val path = indexPath(
      "e77-ivfsq8t/" + dir.replaceAll("[^A-Za-z0-9._-]", "_"))
    val ok = try {
      IndexManifest.require(path, "ivf-sq8",
        Map("train_iters" -> KMEANS_ITERS.toLong, "partition_by_cell" -> 1L))
      IndexManifest.isFresh(path, emb, "vec_id")
    } catch { case _: IndexManifestException => false }
    if (!ok) Similarity.saveIvfSq8Index(emb, path, KCENTER_K,
      partitionByCell = true, trainIters = KMEANS_ITERS)
    path
  }

  /** The VERSIONED training-shard store d155/d156 time-travel against —
    * built on the 3/4-cut history (= snapshot v1), grown by one append
    * (= v2); one idempotent slot per data dir (the keepCached
    * convention: whichever consumer runs first pays the build, and an
    * existing store matching params + both version watermarks + the
    * live freshness pair is reused as-is). Returns the store path.
    */
  private def shardStoreVersioned(spark: SparkSession, dir: String): String = {
    import graft.sources.{IndexManifest, IndexManifestException}
    val docs = Tables.documents(spark, dir)
    val cut = docs.agg(max(col("doc_id"))).head().getLong(0) * 3 / 4
    val path = indexPath(
      "d155-shards/" + dir.replaceAll("[^A-Za-z0-9._-]", "_"))
    val ok = try {
      IndexManifest.require(path, "shards",
        Map("budget" -> SHARD_BUDGET, "bucket_bits" -> 8L))
      IndexManifest.versions(path) == Seq(1, 2) &&
        IndexManifest.readVersion(path, 1).corpusMaxId == cut &&
        IndexManifest.isFresh(path, docs, "doc_id")
    } catch { case _: IndexManifestException => false }
    if (!ok) {
      Packing.saveTokenShards(docs.filter(col("doc_id") <= cut), path,
        SHARD_BUDGET)
      Packing.appendTokenShards(docs.filter(col("doc_id") > cut), path)
    }
    path
  }

  /** The unigram-model artifact slot, one per data directory (the
    * keepCached convention) — d101/d102/d103/d104 all read it.
    */
  private def uniModelPath(dir: String): String =
    indexPath("d104-unigram/" + dir.replaceAll("[^A-Za-z0-9._-]", "_"))

  private def uniModelCached(spark: SparkSession, dir: String) =
    Unigram.unigramModelCached(Tables.documents(spark, dir),
      uniModelPath(dir), UNI_L, UNI_EM)

  /** The BPE merge-table artifact slot, one per data directory —
    * d103/d113 read it (d59/d61 keep their self-contained training
    * registrations; the store is the deployment shape beside them).
    */
  private def bpeCached(spark: SparkSession, dir: String) =
    TextAnalysis.bpeModelCached(Tables.documents(spark, dir),
      indexPath("d113-bpe/" + dir.replaceAll("[^A-Za-z0-9._-]", "_")),
      BPE_MERGES)

  /** The spectral-model artifact slot, one per data directory (the
    * keepCached convention) — e64/e65/e66/e68/e69 all read it;
    * whichever row runs first pays the one corpus-touching covariance
    * pass (before the artifact, e64/e65/e66 EACH rebuilt it — the
    * round's entire bench growth beyond new-row count per the round-11
    * verdict).
    */
  private def specCached(spark: SparkSession, dir: String) =
    Similarity.spectralCached(Tables.embeddings(spark, dir),
      indexPath("e67-spectral/" + dir.replaceAll("[^A-Za-z0-9._-]", "_")),
      PQ_DIMS, PCA_ITERS)

  /** The two suffix-array artifact slots (per-doc / generalized), one
    * each per data directory — d105-d107 read the first, d108-d110 the
    * second; whichever row runs first pays the doubling ladder.
    */
  private def sfxCached(spark: SparkSession, dir: String, global: Boolean) =
    TextAnalysis.suffixIndexCached(Tables.documents(spark, dir),
      indexPath((if (global) "d108-sfx-global/" else "d105-sfx/") +
        dir.replaceAll("[^A-Za-z0-9._-]", "_")), global)

  /** d16/d19 stratified keep-rates (Seq: deterministic SQL-gen order). */
  private val SAMPLE_RATES = Seq("en" -> 0.5, "es" -> 0.25, "de" -> 0.125)
  private val SAMPLE_DEFAULT = 1.0

  private val PACK_SHARDS = 8    // d20 hash shards
  private val PACK_SEQLEN = 2048 // d20 training-sequence length (tokens)

  private val EPOCHS = 2         // d95 epoch-shuffle permutations
  private val LOADER_SHARDS = 4  // d95 round-robin loader shards
  private val SPLIT_SALT = "v1"  // d96 split salt (re-salting redraws)
  private val SPLIT_FRACS =      // d96 cumulative split fractions
    Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
  private val RESAMPLE_N = 100   // d97 systematic-resample draw count
  private val ZIPF_K = 100       // d98 regression depth (caps at vocab)
  private val CMS_DEPTH = 4      // d99 Count-Min hash rows
  private val CMS_WIDTH = 64     // d99 counters per row
  private val CMS_TERMS =        // d99 audit terms ("zzz" absent: est
    Seq("the", "spark", "hash", "zzz") // measures pure collision mass)
  private val PHRASE =           // d100 adjacent-token phrase (present
    Seq("slow", "hash", "batch") // at sf0.01: 8 occurrences — measured)
  private val BLOCK_WORDS =      // d143 blocklist ('dup' df 25/500;
    Seq("dup", "lorem")          // 'lorem' absent — no-hit path live)
  private val Z_BITS = 10        // d144/d145 z-grid bits per dimension
  private val Z_BUCKET_BITS = 4  // d145 partition prefix (16 buckets)
  private val Z_UX = (100L, 300L) // d145 rectangle: user dimension
  private val Z_TY = (200L, 500L) // d145 rectangle: hour dimension
  private val PMI_K = 20         // d141 collocations kept
  private val PMI_MIN = 5L       // d141 min pair count (>= delta)
  private val PMI_DELTA = 5L     // d141 word2phrase discount
  private val PCA_ITERS = 3      // e64/e65 power-iteration rounds
  private val JL_M = 8           // e60/e61 reduced dimension
  private val AMS_EST = 8        // d147 independent AMS estimators
  private val FILT_LABEL = 3     // e58/e59 candidate label filter
  private val GB_K = 5           // e54 results per query
  private val GB_BEAM = 8        // e54 beam width
  private val GB_ROUNDS = 3      // e54 expansion rounds
  private val GB_ENTRIES = 4     // e54 fixed entry nodes (vec_id < 4)
  private val PR_ITERS = 3       // e50 power-iteration steps
  private val PR_DAMP = 85       // e50 damping (percent — integer)
  private val PR_SCALE = 1000000000000L // e50 total micro-mass per node
  private val UNI_L = 4          // d101/d102 max unigram piece length
  private val UNI_EM = 2         // d101/d102 hard-EM rounds
  private val CAPTION_T = 0.9    // m10 alignment keep threshold
  private val LREP_MAX = 10      // d107 self-repetition verdict cut (words)
  private val CROSS_CONTAM = 13  // d110 cross-doc shared-span verdict cut
  private val CHUNK_W = 32       // d112 chunk window (words)
  private val CHUNK_S = 24       // d112 chunk stride (words; overlap 8)
  private val FUSE_K = 20        // d117 per-list retrieval depth
  private val FUSE_OUT = 10      // d117 fused result size
  private val RRF_SCALE = 1000000000000L // d117 integer RRF micro-units
  private val EVAL_TERMS =       // d128 query (dup: df=25/500 — the
    Seq("dup", "table", "spark") // conjunctive label discriminates)
  private val MMR_QID = 0L       // e52 query vector
  private val MMR_POOL = 12      // e52 candidate-pool depth
  private val MMR_OUT = 5        // e52 diversified result size
  private val SOURCE_CAP = 15    // d130 max docs per source (sources
                                 // hold 25 at sf0.01 — the cap bites)
  private val CARD_P = 8         // d132 HLL register bits (d81's)
  private val ALIAS_W =          // d134 mixture weights (integer units;
    Seq("en" -> 4L, "es" -> 3L,  // constant so BOTH engines generate
      "de" -> 2L, "fr" -> 1L)    // their CASE from one alias table)
  private val ALIAS_SLOTS = 1000L // d134 realized dataloader slots
  private val BATCH_B = 16       // d126/d127 batch size (docs)
  private val BUCKET_W = 16      // d126/d127 length-bucket width (tokens)
  private val PAIR_CTX = 108     // d121/d122 pair-pack context (tokens;
                                 // fold sums measure 106-112 at sf0.01,
                                 // so both the shared-bin and the
                                 // doesn't-fit branch are exercised)

  private val KNN_K = 3          // e06 neighbors per vector
  private val CHUNK_TOKENS = 64  // d23 context-window size
  private val CHUNK_STRIDE = 48  // d23 window stride (overlap = 16)
  private val CDC_MODULUS = 8    // d25 expected content-defined chunk length
  private val KMEANS_ITERS = 2   // e08 Lloyd passes
  private val PQ_PASSES = 2      // e11b PQ training passes

  /** d24 target mixture + token budget (Seq: deterministic SQL order). */
  private val MIX_TARGETS = Seq("en" -> 0.4, "es" -> 0.3, "de" -> 0.2, "fr" -> 0.1)
  private val MIX_BUDGET_FRAC = 0.5

  /** d65 UniMax constants — chosen so the waterfall is genuinely
    * exercised on this corpus (measured shares ≈ .23/.24/.29/.23):
    * three strata cap at 0.5 epochs and the largest absorbs the
    * redistributed remainder.
    */
  private val UNIMAX_BUDGET = 0.48
  private val UNIMAX_EPOCHS = 0.5
  private val CONTAM_N = 8       // d67 overlap n-gram length
  private val CONTAM_FRAC = 0.7  // d67 contamination threshold
  private val WSAMPLE_K = 100    // d70 weighted-sample size
  private val TEMP_ALPHA = 0.3   // d71 smoothing exponent (XLM-R's α)

  private val FRAME_BYTES = 256 // m03 frame size
  private val FRAME_STRIDE = 4  // m03: keep every 4th frame
  private val PATCH_TOKENS = 16 // m07: patch tokens per sampled frame
  private val MAX_DIM = 48      // m04 fit-in-box dimension

  /** StubCodec dimension arithmetic as DuckDB SQL — THE shared copy for
    * every oracle that needs decoded dims (m02, m04); keep in lockstep
    * with [[graft.operators.Multimodal.StubCodec]].
    */
  private val stubDimsSql =
    """CAST(16 + (octet_length(encode(text)) % 64) AS BIGINT) AS width,
      | CAST(16 + ((octet_length(encode(text)) // 64) % 64) AS BIGINT) AS height""".stripMargin.replace("\n", " ")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // fixed-stride frame sampling over the binary payload (the cheap
    // subsample step ahead of decode/embed; Multimodal.frameSample doc)
    "m03_frame_sample" -> ((spark: SparkSession, dir: String) =>
      Multimodal.frameSample(
        Multimodal.mediaView(Tables.documents(spark, dir)), FRAME_BYTES, FRAME_STRIDE)
        .orderBy(col("doc_id"))),

    // caption-media alignment filter (m10): the CLIP-score curation
    // shape with stub fingerprint encoders — matched pairs + successor
    // misaligned controls, keep = align >= threshold
    // (Multimodal.captionAlign doc)
    "m10_caption_align" -> ((spark: SparkSession, dir: String) =>
      Multimodal.captionAlign(Tables.documents(spark, dir), CAPTION_T)
        .orderBy(col("doc_id"), col("cap_doc_id"))),

    // BPE-vs-unigram tokenizer audit (d103): corpus fertility of both
    // trained tokenizers on the same corpus; unigram side reads the
    // shared d104 artifact slot (Unigram.tokenizerCompare doc)
    "d103_tokenizer_compare" -> ((spark: SparkSession, dir: String) =>
      Unigram.tokenizerCompare(Tables.documents(spark, dir),
        uniModelCached(spark, dir), bpeCached(spark, dir), UNI_L)),

    // blockwise 60-bit binary fingerprint (m05): the pHash SHAPE of
    // image dedup over opaque payloads (Multimodal.mediaPhash doc)
    "m05_media_phash" -> ((spark: SparkSession, dir: String) =>
      Multimodal.mediaPhash(Multimodal.mediaView(Tables.documents(spark, dir)))
        .orderBy(col("doc_id"))),

    // media near-dup pairs (m06): each even-id payload gets a
    // same-length single-byte-corrupted twin (id + 1000000) unioned
    // into the corpus — the twin differs in at most the first block,
    // so every pair is within Hamming radius and the banded join must
    // find all of them (Multimodal.mediaNearDupPairs doc)
    "m06_media_neardup" -> ((spark: SparkSession, dir: String) => {
      val media = Multimodal.mediaView(Tables.documents(spark, dir))
      val twins = media.filter(col("doc_id") % 2 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          expr("cast(concat(cast('Z' as binary), substring(payload, 2, octet_length(payload) - 1)) as binary)")
            .as("payload"),
          col("lang"), col("source"))
      Multimodal.mediaNearDupPairs(media.unionByName(twins), SIMHASH_RADIUS)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // resize planning over the stub dims (integer functions of payload
    // length, Column-side — the full decodeAll object round-trip +
    // feature scan would be paid for two columns it immediately drops;
    // decode chaining itself is m02's job. stubDims ≡ decodeAll dims is
    // spec-asserted.)
    "m04_resize_plan" -> ((spark: SparkSession, dir: String) =>
      Multimodal.resizePlan(
        Multimodal.stubDims(
          Multimodal.mediaView(Tables.documents(spark, dir))), MAX_DIM)
        .orderBy(col("doc_id"))),

    // LAION-style media admission gate (m11): size/aspect/byte bounds
    // from container metadata, BEFORE any decode — all three rules
    // measured biting at sf0.01 (232/292/37 of 500)
    // (Multimodal.mediaAdmission doc)
    "m11_media_admission" -> ((spark: SparkSession, dir: String) =>
      Multimodal.mediaAdmission(
        Multimodal.mediaView(Tables.documents(spark, dir)))
        .orderBy(col("doc_id"))),

    // interleaved multimodal packing (m07): media patch tokens first,
    // then text, through the SAME shuffled prefix-sum/window machinery
    // as d48 — per (doc, window) span the media/text split is interval
    // arithmetic (Packing.interleavedPack doc)
    "m07_interleaved_pack" -> ((spark: SparkSession, dir: String) =>
      Packing.interleavedPack(Tables.documents(spark, dir), CTX_LEN,
        FRAME_BYTES, FRAME_STRIDE, PATCH_TOKENS)
        .orderBy(col("ctx_id"), col("doc_id"))),

    // persisted media-phash index (m08): history fingerprints persisted
    // once, the increment (fresh %4=0 blobs + single-byte-corrupted
    // twins of %4=1 history blobs) probed with the m06 pigeonhole join
    // — twins flag against their originals, fresh content passes
    // (Multimodal.savePhashIndex / mediaNearDupIndexed docs)
    "m08_phash_indexed" -> ((spark: SparkSession, dir: String) => {
      val media = Multimodal.mediaView(Tables.documents(spark, dir))
      val path = indexPath("m08-phash")
      Multimodal.savePhashIndex(media.filter(col("doc_id") % 4 =!= 0), path,
        SIMHASH_RADIUS)
      Multimodal.mediaNearDupIndexed(phashProbeSet(media), path)
        .orderBy(col("doc_id"))
    }),

    // phash index maintenance (m09): partial build, one sync that must
    // append (fingerprints are parameter-derived — append ≡ rebuild
    // exactly), one that must no-op, then serve — m08's oracle verbatim
    // (Multimodal.phashIndexSync doc)
    "m09_phash_synced" -> ((spark: SparkSession, dir: String) => {
      val media = Multimodal.mediaView(Tables.documents(spark, dir))
      val history = media.filter(col("doc_id") % 4 =!= 0)
      val cut = history.agg(max(col("doc_id"))).head().getLong(0) * 3 / 4
      val path = indexPath("m09-phash")
      Multimodal.savePhashIndex(history.filter(col("doc_id") <= cut), path,
        SIMHASH_RADIUS)
      val a1 = Multimodal.phashIndexSync(history, path, SIMHASH_RADIUS)
      require(a1 == "append", s"first sync took '$a1', expected append")
      val a2 = Multimodal.phashIndexSync(history, path, SIMHASH_RADIUS)
      require(a2 == "fresh", s"second sync took '$a2', expected fresh")
      Multimodal.mediaNearDupIndexed(phashProbeSet(media), path)
        .orderBy(col("doc_id"))
    }),

    // TIME-TRAVEL probe of the phash media index (m12): build on the
    // 3/4-cut of history = v1, append the rest = v2, probe AT v1 —
    // dedup an increment against exactly the media corpus version a
    // past run published; one pushed doc_id cut on the block table
    // (Multimodal.mediaNearDupIndexed asOf doc); oracle = the m08
    // chain with the index side cut at v1's watermark
    "m12_phash_time_travel" -> ((spark: SparkSession, dir: String) => {
      val media = Multimodal.mediaView(Tables.documents(spark, dir))
      val history = media.filter(col("doc_id") % 4 =!= 0)
      val cut = history.agg(max(col("doc_id"))).head().getLong(0) * 3 / 4
      val path = indexPath("m12-phash")
      Multimodal.savePhashIndex(history.filter(col("doc_id") <= cut), path,
        SIMHASH_RADIUS)
      Multimodal.appendPhashIndex(history.filter(col("doc_id") > cut), path)
      Multimodal.mediaNearDupIndexed(phashProbeSet(media), path,
        asOfVersion = Some(1))
        .orderBy(col("doc_id"))
    }),

    "d01_exact_dedup" -> ((spark: SparkSession, dir: String) =>
      Dedup.exactGroups(Tables.documents(spark, dir))
        .orderBy(col("digest"))),

    "d02_minhash_bands" -> ((spark: SparkSession, dir: String) =>
      Dedup.bandKeys(
        Dedup.minhash(Dedup.hashedShingles(Tables.documents(spark, dir)), K), K, BANDS)
        .orderBy(col("doc_id"))),

    "d03_lsh_pairs" -> ((spark: SparkSession, dir: String) =>
      Dedup.lshNearDupPairs(Tables.documents(spark, dir), K, BANDS, 0.5,
        MAX_BUCKET, MAX_DF)
        .orderBy(col("doc_a"), col("doc_b"))),

    // contrastive-triplet mining (d123): anchor + best near-dup
    // positive + deterministic pseudo-random negative — the embedding-
    // trainer dataloader row (Dedup.tripletMine doc)
    "d123_triplet_mine" -> ((spark: SparkSession, dir: String) =>
      Dedup.tripletMine(Tables.documents(spark, dir), K, BANDS, 0.5,
        MAX_BUCKET, MAX_DF)
        .orderBy(col("anchor"))),

    // hard-negative mining (d125): the nearest embedding neighbor that
    // is NOT a near-dup — bucketed ANN candidates, one anti-join
    // (Dedup.tripletMineHard doc)
    "d125_hard_negatives" -> ((spark: SparkSession, dir: String) =>
      Dedup.tripletMineHard(Tables.documents(spark, dir),
        Tables.embeddings(spark, dir), K, BANDS, 0.5, MAX_BUCKET, MAX_DF,
        KNN_K, ANN_BITS)
        .orderBy(col("anchor"))),

    // Incremental dedup across corpus versions: NEW docs (doc_id%4=0)
    // vs the history slice via CDC chunk containment — one digest
    // equi-join per increment, no history re-clustering
    // (Dedup.cdcIncremental doc)
    "d28_cdc_incremental" -> ((spark: SparkSession, dir: String) => {
      val docs = Tables.documents(spark, dir)
      Dedup.cdcIncremental(
        docs.filter(col("doc_id") % 4 === 0),
        docs.filter(col("doc_id") % 4 =!= 0),
        CDC_MODULUS, 0.5, MAX_DF)
        .orderBy(col("doc_id"))
    }),

    // Signature-only Jaccard ESTIMATION (Dedup.minhashEstPairs doc):
    // d03's exact verify re-joins the full shingle stream per candidate;
    // this scores candidates from k=64 signature agreement alone — the
    // O(docs) signature store is the only scoring input. No threshold:
    // the operator's product is the estimate itself.
    "d27_minhash_est" -> ((spark: SparkSession, dir: String) =>
      Dedup.minhashEstPairs(Tables.documents(spark, dir), EST_K, EST_BANDS,
        MAX_BUCKET)
        .orderBy(col("doc_a"), col("doc_b"))),

    // SimHash Hamming-radius pairs: multi-index block candidates (full
    // recall by pigeonhole), exact bit_count verify
    // (Dedup.simhashHammingPairs doc)
    "d30_simhash_pairs" -> ((spark: SparkSession, dir: String) =>
      Dedup.simhashHammingPairs(Tables.documents(spark, dir), SIMHASH_RADIUS,
        MAX_BUCKET)
        .orderBy(col("doc_a"), col("doc_b"))),

    // Lexical k-NN graph: d27's estimates symmetrized into per-doc
    // top-k — the document twin of e06's embedding k-NN graph
    // (Dedup.minhashKnnGraph doc)
    "d29_lexical_knn" -> ((spark: SparkSession, dir: String) =>
      Dedup.minhashKnnGraph(Tables.documents(spark, dir), LEX_KNN_K,
        EST_K, EST_BANDS, MAX_BUCKET)
        .orderBy(col("doc_id"), col("rk"))),

    // The exact-recall all-pairs path is quadratic in shingle
    // co-occurrence BY DESIGN (Dedup.jaccardAll doc) — d03's LSH pre-
    // filter is the production path at scale. Registered over a bounded
    // corpus slice (even doc_ids) so the reference path stays verified
    // end-to-end without the quadratic term dominating every benchmark;
    // the oracle mirrors the same slice.
    "d04_jaccard_pairs" -> ((spark: SparkSession, dir: String) =>
      Dedup.jaccardAll(
        Tables.documents(spark, dir).filter(col("doc_id") % 2 === 0), 0.4, MAX_DF)
        .orderBy(col("doc_a"), col("doc_b"))),

    // directional containment pairs (d139): |A∩B|/|A| — the asymmetric
    // subset-copy signal Jaccard misses; same bounded slice as d04
    // (Dedup.containmentPairs doc)
    "d139_containment_pairs" -> ((spark: SparkSession, dir: String) =>
      Dedup.containmentPairs(
        Tables.documents(spark, dir).filter(col("doc_id") % 2 === 0),
        CONTAIN_T, MAX_DF)
        .orderBy(col("doc_src"), col("doc_dst"))),

    // preference-pair construction (d140): per-source (chosen,
    // rejected) by the d07 stopword-density score — the DPO dataset
    // shape (Curation.preferencePairs doc)
    "d140_preference_pairs" -> ((spark: SparkSession, dir: String) =>
      Curation.preferencePairs(Tables.documents(spark, dir))
        .orderBy(col("source"))),

    // exact similarity join by PREFIX FILTERING (d133): no false
    // negatives, candidates from the prefix inverted index only —
    // registers against d04's oracle VERBATIM (Dedup.ppJoinPairs doc)
    "d133_ppjoin_pairs" -> ((spark: SparkSession, dir: String) =>
      Dedup.ppJoinPairs(
        Tables.documents(spark, dir).filter(col("doc_id") % 2 === 0), 0.4, MAX_DF)
        .orderBy(col("doc_a"), col("doc_b"))),

    // estimator-vs-exact agreement (d52): the recall-device idea
    // applied to the dedup family — every pair EITHER path surfaces on
    // the d04 slice, with both scores and a status (both / exact_only
    // = LSH's probabilistic miss at low Jaccard / est_only = df-capped
    // stop-shingle mass or band chance collision)
    // (Dedup.minhashAgreement doc)
    "d52_minhash_agreement" -> ((spark: SparkSession, dir: String) =>
      Dedup.minhashAgreement(
        Tables.documents(spark, dir).filter(col("doc_id") % 2 === 0),
        EST_K, EST_BANDS, MAX_BUCKET, MAX_DF)
        .orderBy(col("doc_a"), col("doc_b"))),

    "d05_simhash" -> ((spark: SparkSession, dir: String) =>
      Dedup.simhash(Tables.documents(spark, dir))
        .orderBy(col("doc_id"))),

    "d06_lang_id" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.langId(Tables.documents(spark, dir))
        .select(col("doc_id"), col("sc_en"), col("sc_es"), col("sc_de"),
          col("sc_fr"), col("pred_lang"))
        .orderBy(col("doc_id"))),

    "d07_quality_score" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.qualityScore(Tables.documents(spark, dir))
        .orderBy(col("doc_id"))),

    "d08_token_counts" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.tokenCounts(Tables.documents(spark, dir))
        .orderBy(col("doc_id"))),

    "d09_fingerprint" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.fingerprint(Tables.documents(spark, dir))
        .orderBy(col("doc_id"))),

    // dedup-by-embedding: cosine near-dup pairs inside LSH sign buckets
    // (threshold 0.4 exercises the path on this random synthetic corpus;
    // real corpora use ~0.95 — Similarity.nearDupPairs doc)
    "d10_embedding_neardup" -> ((spark: SparkSession, dir: String) =>
      Similarity.nearDupPairs(Tables.embeddings(spark, dir), 0.4, ANN_BITS)
        .orderBy(col("vec_a"), col("vec_b"))),

    // semantic dedup decisions: the SAME connected-components operator
    // as d12, fed embedding-cosine pair evidence instead of LSH text
    // pairs — pair miners and the cluster resolver compose freely
    "e05_embed_clusters" -> ((spark: SparkSession, dir: String) => {
      val emb = Tables.embeddings(spark, dir)
      val pairs = Similarity.nearDupPairs(emb, 0.4, ANN_BITS)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
      Dedup.dedupClusters(emb.select(col("vec_id").as("doc_id")), pairs)
        .select(col("doc_id").as("vec_id"), col("cluster_id"), col("cluster_size"))
        .orderBy(col("vec_id"))
    }),

    // SemDeDup (e45): cluster-bounded embedding dedup — near-dup pair
    // search confined to the trained cluster structure (the shared IVF
    // assignment device, so dedup geometry and index geometry cannot
    // disagree), verdict = keep-lowest-id per dup set
    // (Similarity.semanticDedup doc; contrast d10's sign-bucket pairs
    // and e05's graph clusters)
    "e45_semdedup" -> ((spark: SparkSession, dir: String) =>
      Similarity.semanticDedup(Tables.embeddings(spark, dir), SEMDEDUP_T, IVF_CELLS)
        .orderBy(col("vec_id"))),

    // e45 on the TRAINED cluster structure (the paper's actual
    // setting): the 2-pass Lloyd means become the centroid set and the
    // dedup geometry tracks cluster quality — one knob, same verdict
    // machinery (Similarity.semanticDedup lloydIters doc)
    "e46_semdedup_trained" -> ((spark: SparkSession, dir: String) =>
      Similarity.semanticDedup(Tables.embeddings(spark, dir), SEMDEDUP_T,
        IVF_CELLS, KMEANS_ITERS)
        .orderBy(col("vec_id"))),

    // greedy k-center diversity selection (e47): farthest-point-first
    // exemplars, coverage radius per step — one literal-scored corpus
    // scan + top-1 per step, selection set driver-resident
    // (Similarity.kCenterGreedy doc; contrast d26's hash-diverse sample)
    "e47_kcenter" -> ((spark: SparkSession, dir: String) =>
      Similarity.kCenterGreedy(Tables.embeddings(spark, dir), KCENTER_K)
        .orderBy(col("step"))),

    // k-means with k-center seeding (e48): e47's farthest-point
    // exemplars replace the arbitrary id seeds, then the standard
    // two-pass Lloyd — the deterministic k-means++ flavor
    // (Similarity.kmeansKcenterSeeded doc; contrast e08's seed cells)
    "e48_kmeans_kcenter" -> ((spark: SparkSession, dir: String) =>
      Similarity.kmeansKcenterSeeded(Tables.embeddings(spark, dir),
        KCENTER_K, KMEANS_ITERS)
        .orderBy(col("cell"), col("dim"))),

    // IVF over TRAINED centroids (e71): the e04 probe chain with its
    // cells from e48's k-center-seeded Lloyd passes — the production
    // IVF shape; e04/e30's seed cells are the measurement baseline
    // (Similarity.ivfTopKTrained doc)
    "e71_ivf_trained" -> ((spark: SparkSession, dir: String) =>
      Similarity.ivfTopKTrained(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, PQ_K, KCENTER_K, KMEANS_ITERS, IVF_PROBES)
        .orderBy(col("query_id"), col("rk"))),

    // what TRAINING the coarse quantizer buys (e72): trained-IVF recall
    // under the shared definition, against the e30 curve point at the
    // same probed-cell fraction (Similarity.ivfRecallTrained doc)
    "e72_ivf_trained_recall" -> ((spark: SparkSession, dir: String) =>
      Similarity.ivfRecallTrained(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, PQ_K, KCENTER_K, KMEANS_ITERS, IVF_PROBES)
        .orderBy(col("query_id"))),

    // TRAINED-quantizer PERSISTED IVF+SQ8 (e77): e71's Lloyd book
    // composed into the e31 persist story — train once at build (the
    // k-center-seeded Lloyd cells), freeze the book in the cents table,
    // serve through the UNCHANGED indexed path (append/sync/as-of reads
    // all reload centroids from the store, so the frozen-book and
    // snapshot contracts compose for free — spec-pinned in
    // Round13OpsSpec) (Similarity.saveIvfSq8Index trainIters doc)
    "e77_ivf_trained_indexed" -> ((spark: SparkSession, dir: String) => {
      val emb = Tables.embeddings(spark, dir)
      Similarity.ivfSq8TopKIndexed(emb, col("vec_id") % 50 === 0,
        trainedIvfStore(spark, dir), PQ_K, IVF_PROBES, pruneScan = true)
        .orderBy(col("query_id"), col("rk"))
    }),

    // what training the coarse book buys IN THE PERSISTED FAMILY (e78):
    // recall of the e77 serve under the shared definition — pairs with
    // e27 (seed centroids) at the same probed-cell budget; registered
    // whatever the delta reads (the e11b measure-don't-assume
    // convention) (Similarity.annRecallIvfSq8Indexed doc)
    "e78_ivf_trained_indexed_recall" -> ((spark: SparkSession, dir: String) => {
      val emb = Tables.embeddings(spark, dir)
      Similarity.annRecallIvfSq8Indexed(emb, col("vec_id") % 50 === 0,
        trainedIvfStore(spark, dir), PQ_K, IVF_PROBES)
        .orderBy(col("query_id"))
    }),

    // SemDeDup with the paper's keep rule (e49): dup groups = connected
    // components of the within-cluster pair graph; each group keeps its
    // member farthest from the centroid (argmin affinity)
    // (Similarity.semanticDedupExtremity doc; contrast e45's lowest-id)
    "e49_semdedup_extremity" -> ((spark: SparkSession, dir: String) =>
      Similarity.semanticDedupExtremity(Tables.embeddings(spark, dir),
        SEMDEDUP_T, IVF_CELLS)
        .orderBy(col("vec_id"))),

    // PageRank over the e06 kNN graph (e50): integer-micro-mass power
    // iteration — graph-centrality data selection, exact BIGINT
    // arithmetic on both engines (Similarity.pageRank doc)
    "e50_pagerank" -> ((spark: SparkSession, dir: String) =>
      Similarity.pageRank(Tables.embeddings(spark, dir), KNN_K, ANN_BITS,
        PR_ITERS)
        .orderBy(col("vec_id"))),

    // graph-traversal ANN (e54): beam search over the small-world
    // navigation graph (multi-probe kNN edges + deterministic
    // long-range shortcuts) — the HNSW/DiskANN query shape completing
    // the ANN ladder (Similarity.graphBeamSearch doc)
    "e54_graph_beam" -> ((spark: SparkSession, dir: String) =>
      Similarity.graphBeamSearch(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, GB_K, GB_BEAM, GB_ROUNDS, KNN_K, ANN_BITS,
        GB_ENTRIES)
        .orderBy(col("query_id"), col("rk"))),

    // graph-walk recall vs the exact baseline, one aggregate row —
    // prices the beam/rounds/entries knobs the way e30 prices probes
    "e55_graph_beam_recall" -> ((spark: SparkSession, dir: String) =>
      Similarity.graphBeamRecall(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, GB_K, GB_BEAM, GB_ROUNDS, KNN_K, ANN_BITS,
        GB_ENTRIES)),

    // recall-per-round curve (e56): every round of ONE walk measured
    // (round i's beam is a prefix of the chain — the e30 curve
    // discipline); monotone by the displacement argument, spec-pinned
    "e56_graph_beam_curve" -> ((spark: SparkSession, dir: String) =>
      Similarity.graphBeamRecallCurve(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, GB_K, GB_BEAM, GB_ROUNDS, KNN_K, ANN_BITS,
        GB_ENTRIES)
        .orderBy(col("rounds"))),

    // graph-walk recall with K-CENTER entry points (e70): the entry-
    // diversity variant at the SAME entry budget as e55 (4 entries) —
    // measured lift at sf0.01: recall 0.10 → 0.22 (fixed prefix vs
    // spread exemplars; the e11b measure-don't-assume discipline)
    // (Similarity.graphBeamRecallKCenter doc)
    "e70_graph_beam_kcenter" -> ((spark: SparkSession, dir: String) =>
      Similarity.graphBeamRecallKCenter(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, GB_K, GB_BEAM, GB_ROUNDS, KNN_K, ANN_BITS,
        GB_ENTRIES)),

    // Johnson-Lindenstrauss ±1 projection (e60): 64 → JL_M dims, each
    // output one codegen'd dot against a literal sign vector
    // (Similarity.jlProject doc)
    "e60_jl_project" -> ((spark: SparkSession, dir: String) =>
      Similarity.jlProject(Tables.embeddings(spark, dir), JL_M, PQ_DIMS)
        .orderBy(col("vec_id"))),

    // reduced-space retrieval recall (e61): exact top-k over the JL
    // vectors vs exact top-k in full space, one row — prices the
    // dimension knob (Similarity.jlRecall doc)
    "e61_jl_recall" -> ((spark: SparkSession, dir: String) =>
      Similarity.jlRecall(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, 5, JL_M, PQ_DIMS)),

    // PCA leading component by power iteration (e64): distributed
    // covariance + quantized matvec rounds, published scaled by max
    // |entry| — served from the shared persisted model (specCached),
    // so the covariance pass is paid once per (corpus, params) across
    // the whole spectral family (Similarity.pcaTopComponentOf doc)
    "e64_pca_top" -> ((spark: SparkSession, dir: String) =>
      Similarity.pcaTopComponentOf(specCached(spark, dir))
        .orderBy(col("dim"))),

    // variance explained by the leading direction (e65): Rayleigh
    // quotient vs trace — ~1/dims on this isotropic corpus, the honest
    // negative control; matvec-only off the shared model
    // (Similarity.pcaVarianceExplainedOf doc)
    "e65_pca_variance" -> ((spark: SparkSession, dir: String) =>
      Similarity.pcaVarianceExplainedOf(specCached(spark, dir))),

    // second principal component by deflation (e66): power iteration
    // on C − λ1·v̂1v̂1ᵀ without materializing it; dims²-scale off the
    // shared model (Similarity.pcaSecondComponentOf doc)
    "e66_pca_second" -> ((spark: SparkSession, dir: String) =>
      Similarity.pcaSecondComponentOf(specCached(spark, dir))
        .orderBy(col("dim"))),

    // the spectral maintenance policy end-to-end (e67): model trained
    // on the 3/4-cut history, synced against the grown corpus — since
    // round 13 the sync APPENDS (e76: the model's sufficient statistics
    // (n, Σx, Σxxᵀ) merge exactly, so growth costs one increment-sized
    // stats pass + a dims²-scale re-derivation, never a corpus rescan) —
    // synced again (the fresh no-op), served. Registered against e64's
    // oracle VERBATIM: the merged model must be BIT-IDENTICAL to the
    // one-pass full-corpus chain — the oracle row IS the merge-exactness
    // proof (Similarity.appendSpectralIndex doc; action strings pinned
    // here and in spec)
    "e67_pca_sync" -> ((spark: SparkSession, dir: String) => {
      val emb = Tables.embeddings(spark, dir)
      val cut = emb.agg(max(col("vec_id"))).head().getLong(0) * 3 / 4
      val path = indexPath("e67-pca-sync")
      Similarity.saveSpectralIndex(emb.filter(col("vec_id") <= cut), path,
        PQ_DIMS, PCA_ITERS)
      val a1 = Similarity.spectralIndexSync(emb, path, PQ_DIMS, PCA_ITERS)
      require(a1 == "append", s"first sync took '$a1', expected append")
      val a2 = Similarity.spectralIndexSync(emb, path, PQ_DIMS, PCA_ITERS)
      require(a2 == "fresh", s"second sync took '$a2', expected fresh")
      Similarity.pcaTopComponentOf(Similarity.loadSpectralIndex(spark, path))
        .orderBy(col("dim"))
    }),

    // TIME TRAVEL for a TRAINED artifact (e79): the model AS OF
    // snapshot v1 — version N's sufficient statistics are the exact
    // decimal sum of per-version deltas 1..N, so the as-of model is a
    // dims²-scale merge + re-derivation, zero corpus passes, and must
    // be BIT-IDENTICAL to the one-pass chain over the history slice
    // (the oracle: e64's text over vec_id <= cut)
    // (Similarity.loadSpectralIndexAt doc)
    "e79_pca_time_travel" -> ((spark: SparkSession, dir: String) => {
      val emb = Tables.embeddings(spark, dir)
      val cut = emb.agg(max(col("vec_id"))).head().getLong(0) * 3 / 4
      val path = indexPath("e79-pca-tt")
      Similarity.saveSpectralIndex(emb.filter(col("vec_id") <= cut), path,
        PQ_DIMS, PCA_ITERS)
      Similarity.appendSpectralIndex(emb.filter(col("vec_id") > cut), path)
      Similarity.pcaTopComponentOf(
        Similarity.loadSpectralIndexAt(spark, path, 1))
        .orderBy(col("dim"))
    }),

    // spectral SPECTRUM diagnostic (e73): (component, λ, trace, share)
    // for the top two directions — the decay reading every whitening/
    // compression decision starts from; ~1/dims shares on this
    // isotropic corpus, the family's standing negative control
    // (Similarity.pcaSpectrum doc)
    "e73_pca_spectrum" -> ((spark: SparkSession, dir: String) =>
      Similarity.pcaSpectrum(specCached(spark, dir))
        .orderBy(col("component"))),

    // all-but-the-top debias re-encode (e68): x' = (x−μ) −
    // (v̂1ᵀ(x−μ))·v̂1 off the shared model — pure scan-side expression
    // work, zero shuffles (Similarity.pcaDebias doc)
    "e68_pca_debias" -> ((spark: SparkSession, dir: String) =>
      Similarity.pcaDebiasRows(Tables.embeddings(spark, dir),
        specCached(spark, dir))
        .orderBy(col("vec_id"), col("dim"))),

    // debiased-space ANN recall (e69): the AFTER arm of the
    // before/after pair (e17 = BEFORE, same multi-probe LSH recall on
    // the raw embeddings) — ~flat on this isotropic corpus by
    // construction, the honest negative control
    // (Similarity.pcaDebiasRecall doc)
    "e69_pca_debias_recall" -> ((spark: SparkSession, dir: String) =>
      Similarity.pcaDebiasRecall(Tables.embeddings(spark, dir),
        specCached(spark, dir), col("vec_id") % 50 === 0, PQ_K, ANN_BITS)
        .orderBy(col("query_id"))),

    // JL two-stage retrieval (e62): reduced-space shortlist + exact
    // rerank — the serving use of the projection
    // (Similarity.jlRerankTopK doc)
    "e62_jl_rerank" -> ((spark: SparkSession, dir: String) =>
      Similarity.jlRerankTopK(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, PQ_K, RERANK_SHORTLIST, JL_M, PQ_DIMS)
        .orderBy(col("query_id"), col("rk"))),

    // what reranking buys on the JL shortlist (e63): per-query recall,
    // >= e61 pointwise at shortlist > k (Similarity.jlRecallReranked)
    "e63_jl_rerank_recall" -> ((spark: SparkSession, dir: String) =>
      Similarity.jlRecallReranked(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, PQ_K, RERANK_SHORTLIST, JL_M, PQ_DIMS)
        .orderBy(col("query_id"))),

    // Good-Turing count-of-counts (d151): frequency-of-frequencies,
    // token-mass share, Turing-adjusted c* — the unseen-mass /
    // vocabulary-coverage diagnostic (TextAnalysis.countOfCounts doc)
    "d151_count_of_counts" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.countOfCounts(Tables.documents(spark, dir))
        .orderBy(col("c"))),

    // cross-source overlap matrix (d152): directional shingle
    // containment between provenance sources — the mirror detector
    // (Dedup.sourceOverlap doc; max 0.144 / mean 0.051 measured at
    // sf0.01, threshold 0.08 bites)
    "d152_source_overlap" -> ((spark: SparkSession, dir: String) =>
      Dedup.sourceOverlap(Tables.documents(spark, dir), SRC_OVERLAP_T)
        .orderBy(col("src_a"), col("src_b"))),

    // per-source boilerplate density (d150): fraction of a source's
    // distinct shingles carried by >= half its docs — the template-
    // heavy-source diagnostic (Dedup.sourceBoilerplate doc)
    "d150_source_boilerplate" -> ((spark: SparkSession, dir: String) =>
      Dedup.sourceBoilerplate(Tables.documents(spark, dir))
        .orderBy(col("source"))),

    // two-sample KS test (d149): numeric drift between the click and
    // purchase value distributions — exact cross-multiplied deviations,
    // one final divide; bucketed prefix device, no global window
    // (Sampling.ksTwoSample doc)
    "d149_ks_test" -> ((spark: SparkSession, dir: String) =>
      Sampling.ksTwoSample(
        Tables.events(spark, dir)
          .filter(col("event_type").isin("click", "purchase")),
        col("event_type") === "click", col("value"))),

    // chi-square feature selection (d148): top-k words by the 2×2
    // presence/class contingency statistic against the lang='en' class
    // — all-integer table, one IEEE divide
    // (TextAnalysis.chiSquareFeatures doc)
    "d148_chi2_features" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.chiSquareFeatures(Tables.documents(spark, dir),
        col("lang") === "en", PMI_K)
        .orderBy(col("rank"))),

    // AMS second-moment sketch (d147): F2 = self-join size, estimated
    // with AMS_EST ±1-sign counters — all-integer until the final
    // divides (TextAnalysis.amsF2 doc)
    "d147_ams_f2" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.amsF2(Tables.documents(spark, dir), AMS_EST)),

    // attribute-filtered ANN (e58): top-k among label-matching
    // candidates only, filter cut scan-side before the bucket join,
    // multi-probe to recover filtered-away candidate volume
    // (Similarity.annTopKFiltered doc)
    "e58_filtered_ann" -> ((spark: SparkSession, dir: String) =>
      Similarity.annTopKFiltered(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, col("label") === FILT_LABEL, 3, ANN_BITS)
        .orderBy(col("query_id"), col("rk"))),

    // filtered-ANN recall vs the exact filtered baseline (e59): one
    // row, denominator = the exact side's actual rows
    "e59_filtered_ann_recall" -> ((spark: SparkSession, dir: String) =>
      Similarity.filteredAnnRecall(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, col("label") === FILT_LABEL, 3, ANN_BITS)),

    // persisted nav-graph serving (e57): the store must not change an
    // answer — registered against e54's oracle verbatim; rebuild-only
    // by design (corpus-global edges), manifest-gated
    // (Similarity.saveNavGraph doc)
    "e57_graph_beam_indexed" -> ((spark: SparkSession, dir: String) => {
      val emb = Tables.embeddings(spark, dir)
      val path = indexPath("e57-nav")
      Similarity.saveNavGraph(emb, path, KNN_K, ANN_BITS)
      Similarity.graphBeamSearchIndexed(spark, path, emb,
        col("vec_id") % 50 === 0, GB_K, GB_BEAM, GB_ROUNDS, GB_ENTRIES)
        .orderBy(col("query_id"), col("rk"))
    }),

    "e01_cosine_topk" -> ((spark: SparkSession, dir: String) =>
      Similarity.cosineTopK(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, 5)
        .orderBy(col("query_id"), col("rk"))),

    "e02_ann_topk" -> ((spark: SparkSession, dir: String) =>
      Similarity.annTopK(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, 3, ANN_BITS)
        .orderBy(col("query_id"), col("rk"))),

    // recall lever: probe Hamming-distance-1 buckets too
    "e03_ann_multiprobe" -> ((spark: SparkSession, dir: String) =>
      Similarity.annTopKMultiProbe(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, 3, ANN_BITS)
        .orderBy(col("query_id"), col("rk"))),

    // Incremental ingest dedup: new batch (even doc_ids) vs history
    // (doc_id % 3 != 0), Bloom pre-filter + exact verify — output exact,
    // so fully oracle-checkable (Dedup.bloomDedup doc)
    "d11_bloom_dedup" -> ((spark: SparkSession, dir: String) =>
      Dedup.bloomDedup(Tables.documents(spark, dir),
        col("doc_id") % 3 =!= 0, col("doc_id") % 2 === 0)
        .orderBy(col("doc_id"))),

    // decontamination: train docs sharing any word 3-gram with the eval
    // split (doc_id % 10 == 0) are flagged; eval gram hashes broadcast,
    // train side never shuffles (Dedup.contamination doc)
    "d13_decontaminate" -> ((spark: SparkSession, dir: String) =>
      Dedup.contamination(Tables.documents(spark, dir), col("doc_id") % 10 === 0)
        .orderBy(col("doc_id"))),

    // fraction-thresholded decontamination (d67): >= 70% of a train
    // doc's distinct 8-grams in the eval split — the published
    // calibrated gate (6 docs flagged at sf0.01, all planted
    // cross-split copies; measured) (Dedup.contaminationFrac doc)
    "d67_contamination_frac" -> ((spark: SparkSession, dir: String) =>
      Dedup.contaminationFrac(Tables.documents(spark, dir),
        col("doc_id") % 10 === 0, CONTAM_N, CONTAM_FRAC)
        .orderBy(col("doc_id"))),

    // hashed-feature linear quality classifier, TRAINING (d68): the
    // fastText-style filtering device as a batch perceptron — all-Long
    // arithmetic, so the whole training trajectory replays exactly in
    // the oracle's pass-by-pass CTE chain (Classifier.trainPerceptron
    // doc). Target domain = lang='en', the d49/d53 trusted-reference
    // device; the registered row is the trained weight vector itself.
    "d68_classifier_train" -> ((spark: SparkSession, dir: String) =>
      Classifier.trainPerceptron(Tables.documents(spark, dir),
        col("lang") === "en", CLS_BUCKETS, CLS_PASSES)
        .orderBy(col("bucket"))),

    // classifier SELECTION (d69): every doc scored under d68's weights
    // (margin = w·x, exact Long), keep = margin > 0 — the score-and-gate
    // half of the published quality-classifier pipelines
    // (Classifier.classifyPerceptron doc)
    "d69_classifier_select" -> ((spark: SparkSession, dir: String) =>
      Classifier.classifyPerceptron(Tables.documents(spark, dir),
        col("lang") === "en", CLS_BUCKETS, CLS_PASSES)
        .orderBy(col("doc_id"))),

    // the PERSISTED classifier (d73): train-once/score-forever for the
    // d68 family — build the manifest-gated weight artifact, then score
    // the corpus from the artifact alone (Classifier.saveClassifier /
    // classifyIndexed docs; self-containment pricing like every index
    // row). Oracle = the d69 chain minus the label columns.
    "d73_classifier_indexed" -> ((spark: SparkSession, dir: String) => {
      val docs = Tables.documents(spark, dir)
      val path = indexPath("d73-perceptron")
      Classifier.saveClassifier(docs, col("lang") === "en", path,
        CLS_BUCKETS, CLS_PASSES)
      Classifier.classifyIndexed(docs, path).orderBy(col("doc_id"))
    }),

    // AVERAGED perceptron (d74): classify under the exact integer SUM
    // of the post-pass weight vectors — the published variance-reduction
    // variant, a positive scaling of the average so no sign changes
    // (Classifier.classifyAveraged doc)
    "d74_classifier_averaged" -> ((spark: SparkSession, dir: String) =>
      Classifier.classifyAveraged(Tables.documents(spark, dir),
        col("lang") === "en", CLS_BUCKETS, CLS_PASSES)
        .orderBy(col("doc_id"))),

    // INCREMENTAL classifier training (d75): train on the 3/4-cut
    // history, warm-start one pass on the increment alone (the online-
    // learning path — history text never re-read), serve the full
    // corpus from the updated artifact. The oracle replays the actual
    // history-then-increment trajectory — NOT a full retrain, which is
    // a different model by design (Classifier.updateClassifier doc).
    "d75_classifier_update" -> ((spark: SparkSession, dir: String) => {
      val docs = Tables.documents(spark, dir)
      val cut = docs.agg(max(col("doc_id"))).head().getLong(0) * 3 / 4
      val path = indexPath("d75-perceptron")
      Classifier.saveClassifier(docs.filter(col("doc_id") <= cut),
        col("lang") === "en", path, CLS_BUCKETS, CLS_PASSES)
      Classifier.updateClassifier(docs.filter(col("doc_id") > cut),
        col("lang") === "en", path, 1)
      Classifier.classifyIndexed(docs, path).orderBy(col("doc_id"))
    }),

    // classifier SYNC (d76): the e34/e43 fresh/update/rebuild policy
    // for the classifier family — history build, one sync that fires
    // the online update, one sync that must no-op, serve. Oracle =
    // d75's chain verbatim (the sync-then-serve round trip)
    // (Classifier.classifierSync doc).
    "d76_classifier_sync" -> ((spark: SparkSession, dir: String) => {
      val docs = Tables.documents(spark, dir)
      val cut = docs.agg(max(col("doc_id"))).head().getLong(0) * 3 / 4
      val path = indexPath("d76-perceptron")
      Classifier.saveClassifier(docs.filter(col("doc_id") <= cut),
        col("lang") === "en", path, CLS_BUCKETS, CLS_PASSES)
      val a1 = Classifier.classifierSync(docs, col("lang") === "en", path,
        CLS_BUCKETS, CLS_PASSES)
      require(a1 == "update", s"first sync took '$a1', expected update")
      val a2 = Classifier.classifierSync(docs, col("lang") === "en", path,
        CLS_BUCKETS, CLS_PASSES)
      require(a2 == "fresh", s"second sync took '$a2', expected fresh")
      Classifier.classifyIndexed(docs, path).orderBy(col("doc_id"))
    }),

    // persisted MinHash-LSH dedup index (d77): build on history
    // (doc_id%4<>0), probe the increment — fuzzy dedup against all of
    // history with no history text read at probe time; per increment
    // doc the banded candidates, best signature-agreement match, and
    // the threshold verdict (Dedup.saveLshIndex / lshDedupIndexed docs)
    "d77_lsh_indexed" -> ((spark: SparkSession, dir: String) => {
      val docs = Tables.documents(spark, dir)
      val path = indexPath("d77-lsh")
      Dedup.saveLshIndex(docs.filter(col("doc_id") % 4 =!= 0), path,
        EST_K, EST_BANDS)
      Dedup.lshDedupIndexed(docs.filter(col("doc_id") % 4 === 0), path,
        0.5, MAX_BUCKET).orderBy(col("doc_id"))
    }),

    // LSH index append (d78): build on the first 3/4 of history, append
    // the rest — signatures are parameter-derived (nothing trained) so
    // append ≡ rebuild EXACTLY; registered against d77's oracle
    // verbatim (the equality IS the claim) (Dedup.appendLshIndex doc)
    "d78_lsh_appended" -> ((spark: SparkSession, dir: String) => {
      val docs = Tables.documents(spark, dir)
      val history = docs.filter(col("doc_id") % 4 =!= 0)
      val cut = history.agg(max(col("doc_id"))).head().getLong(0) * 3 / 4
      val path = indexPath("d78-lsh")
      Dedup.saveLshIndex(history.filter(col("doc_id") <= cut), path,
        EST_K, EST_BANDS)
      Dedup.appendLshIndex(history.filter(col("doc_id") > cut), path)
      Dedup.lshDedupIndexed(docs.filter(col("doc_id") % 4 === 0), path,
        0.5, MAX_BUCKET).orderBy(col("doc_id"))
    }),

    // LSH index sync (d79): partial build, one sync that must append,
    // one that must no-op, then serve — d77's oracle verbatim
    // (Dedup.lshIndexSync doc)
    "d79_lsh_sync" -> ((spark: SparkSession, dir: String) => {
      val docs = Tables.documents(spark, dir)
      val history = docs.filter(col("doc_id") % 4 =!= 0)
      val cut = history.agg(max(col("doc_id"))).head().getLong(0) * 3 / 4
      val path = indexPath("d79-lsh")
      Dedup.saveLshIndex(history.filter(col("doc_id") <= cut), path,
        EST_K, EST_BANDS)
      val a1 = Dedup.lshIndexSync(history, path, EST_K, EST_BANDS)
      require(a1 == "append", s"first sync took '$a1', expected append")
      val a2 = Dedup.lshIndexSync(history, path, EST_K, EST_BANDS)
      require(a2 == "fresh", s"second sync took '$a2', expected fresh")
      Dedup.lshDedupIndexed(docs.filter(col("doc_id") % 4 === 0), path,
        0.5, MAX_BUCKET).orderBy(col("doc_id"))
    }),

    // TIME-TRAVEL probe of the LSH dedup index (d157): build on the
    // 3/4-cut of history = v1, append the rest = v2, probe the
    // increment AT v1 — the same candidate join over one pushed doc_id
    // cut on both index tables, with the bucket cap evaluated at the
    // SNAPSHOT's counts (Dedup.lshDedupIndexed asOf doc); oracle = the
    // d77 chain with the index side cut to the v1 watermark
    "d157_lsh_time_travel" -> ((spark: SparkSession, dir: String) => {
      val docs = Tables.documents(spark, dir)
      val history = docs.filter(col("doc_id") % 4 =!= 0)
      val cut = history.agg(max(col("doc_id"))).head().getLong(0) * 3 / 4
      val path = indexPath("d157-lsh")
      Dedup.saveLshIndex(history.filter(col("doc_id") <= cut), path,
        EST_K, EST_BANDS)
      Dedup.appendLshIndex(history.filter(col("doc_id") > cut), path)
      Dedup.lshDedupIndexed(docs.filter(col("doc_id") % 4 === 0), path,
        0.5, MAX_BUCKET, asOfVersion = Some(1)).orderBy(col("doc_id"))
    }),

    // DoReMi per-domain excess loss (d80): Group-DRO's λ_k over the
    // d53 model pair — per-gram max(0, ℓ_proxy − ℓ_ref) in exact
    // decimals, aggregated per stratum, ranked; the exp(η·λ) update
    // tail is spec-pinned, not registered (TextAnalysis.doremiExcess
    // doc)
    "d80_doremi_excess" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.doremiExcess(Tables.documents(spark, dir),
        col("lang") === "en").orderBy(col("lang"))),

    // deterministic HyperLogLog gram cardinality (d81): the sketch
    // ITSELF registers cross-engine (dense 256-register HLL, exact
    // integer harmonic sum, one shared double literal), beside the
    // exact distinct count and the relative error
    // (Dedup.hllGramCardinality doc)
    "d81_hll_grams" -> ((spark: SparkSession, dir: String) =>
      Dedup.hllGramCardinality(Tables.documents(spark, dir))
        .orderBy(col("lang"))),

    // weighted sampling without replacement (d70): Efraimidis–Spirakis
    // priority keys over the hash uniform, weight = n_chars, top-k as
    // TakeOrderedAndProject (Sampling.weightedSample doc)
    "d70_weighted_sample" -> ((spark: SparkSession, dir: String) =>
      Sampling.weightedSample(Tables.documents(spark, dir),
        col("n_chars"), WSAMPLE_K)),

    // temperature-scaled mixture (d71): the α-smoothed multilingual
    // sampling law over the same langId strata and token budget as d65,
    // making the cap-vs-smooth trade auditable on one corpus
    // (Curation.temperatureMixture doc)
    "d71_temperature_mixture" -> ((spark: SparkSession, dir: String) =>
      Curation.temperatureMixture(
        TextAnalysis.langId(Tables.documents(spark, dir)), col("pred_lang"),
        TEMP_ALPHA, UNIMAX_BUDGET)
        .orderBy(col("stratum"))),

    // soft dedup weights (d72): commonness = mean log gram
    // doc-frequency fraction — the reweighting alternative to d01/d63's
    // hard removal (Dedup.softDedupWeights doc)
    "d72_softdedup_weights" -> ((spark: SparkSession, dir: String) =>
      Dedup.softDedupWeights(Tables.documents(spark, dir))
        .orderBy(col("doc_id"))),

    // Gopher-style repetition quality signals: duplicate-token fraction
    // + most-frequent-bigram share (TextAnalysis.repetition doc)
    "d14_repetition" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.repetition(Tables.documents(spark, dir))
        .orderBy(col("doc_id"))),

    // vocab/tokenizer count pass: top-100 tokens by term frequency with
    // doc frequencies; top-k plans as TakeOrderedAndProject
    // (TextAnalysis.vocab doc)
    "d15_vocab" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.vocab(Tables.documents(spark, dir))
        .orderBy(col("rank"))),

    // OOV rate vs the corpus's own top-100 vocabulary — d15's artifact
    // folded back as a scan-side InSet membership probe; the derived-
    // vocabulary twin of d07's fixed stopword ratio
    // (TextAnalysis.oovRate doc)
    "d31_oov_rate" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.oovRate(Tables.documents(spark, dir))
        .orderBy(col("doc_id"))),

    // PII redaction: email/URL/long-digit rewrite chain + counts. The
    // corpus has zero redactable spans (measured), so this row verifies
    // the identity path; rewrites are spec-proven on constructed rows
    // (TextAnalysis.redactPii doc)
    "d32_pii_redact" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.redactPii(Tables.documents(spark, dir))
        .orderBy(col("doc_id"))),

    // winnowing fingerprint selection (Schleimer et al., SIGMOD'03): the
    // window-min posting list guaranteeing any shared (w+n-1)-word run
    // shares a fingerprint — per-doc array work, zero exchanges
    // (Dedup.winnowFingerprints doc)
    "d33_winnow_fp" -> ((spark: SparkSession, dir: String) =>
      Dedup.winnowFingerprints(Tables.documents(spark, dir), 3, WINNOW_W)
        .orderBy(col("doc_id"), col("pos"))),

    // the posting list's matcher: docs sharing >= 2 selected
    // fingerprints — the partial-copy detector whole-doc Jaccard
    // dilutes away; at minShared=1 the corpus yields ~3.4k chance
    // collisions, at 2 the 103 genuine pairs (measured)
    // (Dedup.winnowCopyPairs doc)
    "d34_winnow_pairs" -> ((spark: SparkSession, dir: String) =>
      Dedup.winnowCopyPairs(Tables.documents(spark, dir), 3, WINNOW_W,
        WINNOW_MIN_SHARED, WINNOW_MAX_DF)
        .orderBy(col("doc_a"), col("doc_b"))),

    // the verification stage: every shared fingerprint with its
    // position in BOTH docs of a d34 pair — consecutive aligned
    // positions ARE the copied span (Dedup.winnowMatchEvidence doc)
    "d35_winnow_evidence" -> ((spark: SparkSession, dir: String) =>
      Dedup.winnowMatchEvidence(Tables.documents(spark, dir), 3, WINNOW_W,
        WINNOW_MIN_SHARED, WINNOW_MAX_DF)
        .orderBy(col("doc_a"), col("doc_b"), col("fp"), col("pos_a"), col("pos_b"))),

    // span assembly: aligned evidence grouped into contiguous runs by
    // the islands device — the word ranges a curation pipeline
    // actually redacts/dedups (Dedup.winnowCopySpans doc)
    "d36_winnow_spans" -> ((spark: SparkSession, dir: String) =>
      Dedup.winnowCopySpans(Tables.documents(spark, dir), 3, WINNOW_W,
        WINNOW_MIN_SHARED, WINNOW_MAX_DF)
        .orderBy(col("doc_a"), col("doc_b"), col("offset"), col("start_a"))),

    // pair-level merged copy extents: d36's per-offset spans
    // interval-merged on doc_a's axis across alignments — the
    // redaction view (Dedup.winnowMergedExtents doc)
    "d39_winnow_extents" -> ((spark: SparkSession, dir: String) =>
      Dedup.winnowMergedExtents(Tables.documents(spark, dir), 3, WINNOW_W,
        WINNOW_MIN_SHARED, WINNOW_MAX_DF)
        .orderBy(col("doc_a"), col("doc_b"), col("start_a"))),

    // per-doc copied-word coverage: both span sides unioned, overlaps
    // merged by a second islands pass — the cross-doc twin of d14's
    // repetition gate (Dedup.winnowCopyCoverage doc)
    "d37_copy_coverage" -> ((spark: SparkSession, dir: String) =>
      Dedup.winnowCopyCoverage(Tables.documents(spark, dir), 3, WINNOW_W,
        WINNOW_MIN_SHARED, WINNOW_MAX_DF)
        .orderBy(col("doc_id"))),

    // exact duplicated runs: every >= 8-word run occurring twice
    // anywhere in the corpus (within-doc repeats count), merged into
    // maximal spans (Dedup.exactSubstrSpans doc)
    "d40_exact_substr_spans" -> ((spark: SparkSession, dir: String) =>
      Dedup.exactSubstrSpans(Tables.documents(spark, dir), EXSUB_LEN)
        .orderBy(col("doc_id"), col("start"))),

    // the cleaning step itself: duplicated spans cut everywhere they
    // occur, remainder re-joined (Dedup.exactSubstrRemoval doc)
    "d41_exact_substr_removal" -> ((spark: SparkSession, dir: String) =>
      Dedup.exactSubstrRemoval(Tables.documents(spark, dir), EXSUB_LEN)
        .orderBy(col("doc_id"))),

    // the keep-first policy: the corpus-ordered first occurrence of
    // each duplicated run survives the cut
    // (Dedup.exactSubstrKeepFirst doc)
    "d42_exact_substr_keep_first" -> ((spark: SparkSession, dir: String) =>
      Dedup.exactSubstrKeepFirst(Tables.documents(spark, dir), EXSUB_LEN)
        .orderBy(col("doc_id"))),

    // the cross-version half (d28's split): increment text duplicating
    // HISTORY is cut, history never rescanned per-pair
    // (Dedup.exactSubstrIncremental doc)
    "d43_exact_substr_incremental" -> ((spark: SparkSession, dir: String) => {
      val docs = Tables.documents(spark, dir)
      Dedup.exactSubstrIncremental(
        docs.filter(col("doc_id") % 4 =!= 0),
        docs.filter(col("doc_id") % 4 === 0), EXSUB_LEN)
        .orderBy(col("doc_id"))
    }),

    // the build-once/probe-many round trip for the gram index: persist
    // history's distinct grams, cut the increment against the table —
    // registered against d43's oracle verbatim (the equality IS the
    // claim); the timed row measures build+persist+probe end to end
    // (Dedup.saveGramIndex / exactSubstrIncrementalIndexed docs)
    "d44_exact_substr_indexed" -> ((spark: SparkSession, dir: String) => {
      val docs = Tables.documents(spark, dir)
      val path = indexPath("d44-gram")
      Dedup.saveGramIndex(docs.filter(col("doc_id") % 4 =!= 0), path, EXSUB_LEN)
      Dedup.exactSubstrIncrementalIndexed(
        docs.filter(col("doc_id") % 4 === 0), path, EXSUB_LEN)
        .orderBy(col("doc_id"))
    }),

    // TIME-TRAVEL probe of the gram index (d154): build on the
    // id-monotone history cut = snapshot v1, append the rest = v2;
    // probing the increment AT v1 recovers exactly the pre-append cut
    // (the CURRENT index contains the increment's own grams, so a
    // latest-version probe would cut everything — spec-pinned
    // contrast). The last of the four append-capable stores under the
    // d153 device (Dedup.appendGramIndex / exactSubstrIncrementalIndexed
    // asOf docs); oracle = the d43 chain on the monotone split
    "d154_exsub_time_travel" -> ((spark: SparkSession, dir: String) => {
      val docs = Tables.documents(spark, dir)
      val cut = docs.agg(max(col("doc_id"))).head().getLong(0) * 3 / 4
      val path = indexPath("d154-gram")
      Dedup.saveGramIndex(docs.filter(col("doc_id") <= cut), path, EXSUB_LEN)
      Dedup.appendGramIndex(docs.filter(col("doc_id") > cut), path, EXSUB_LEN)
      Dedup.exactSubstrIncrementalIndexed(
        docs.filter(col("doc_id") > cut), path, EXSUB_LEN,
        asOfVersion = Some(1))
        .orderBy(col("doc_id"))
    }),

    // THE end-to-end curation verdict: one row per TRAIN doc with the
    // full keep decision and its reason bits — dedup representative
    // (d12), decontaminated (d13), length + repetition quality gates
    // (d14), language-stratified sample membership (d16). Each input is
    // the registered operator itself, so this query is the composition
    // proof: a corpus curation run IS this DataFrame written out.
    // Served through the PERSISTED-ARTIFACT cache (the d44/e31 pattern
    // applied to curation): whichever consumer runs first builds the
    // verdict parquet; every later run — including d38 below and this
    // query's own second bench run — scans the artifact. Manifest
    // (gate params + corpus watermark) misses rebuild, so the cache
    // can never serve a stale or differently-gated verdict
    // (Curation.keepListCached doc; bit-identity spec in Round9OpsSpec)
    "d19_curation_keep" -> ((spark: SparkSession, dir: String) =>
      keepCached(spark, dir).orderBy(col("doc_id"))),

    // the verdict's drop accounting: one row of per-reason counts —
    // the gate-health dashboard a curation run watches across corpus
    // versions; consumes the d19 ARTIFACT (one parquet scan + one agg
    // when warm), not a re-derivation of the chain
    // (Curation.keepSummary doc)
    "d38_keep_summary" -> ((spark: SparkSession, dir: String) =>
      Curation.keepSummary(keepCached(spark, dir))),

    // CCNet-style self-perplexity: corpus-trained add-one bigram LM,
    // per-doc average negative log-likelihood (TextAnalysis.bigramLm
    // doc; per-gram nll rounded to DECIMAL(28,8) in the model so the
    // decimal sum is cross-engine exact)
    "d45_bigram_lm" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.bigramLm(Tables.documents(spark, dir))
        .orderBy(col("doc_id"))),

    // Kneser-Ney smoothed bigram LM (d136): absolute discounting with
    // continuation-probability backoff — D=3/4 makes every probability
    // a ratio of two exact BIGINTs (TextAnalysis.kneserNeyLm doc)
    "d136_kneser_ney_lm" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.kneserNeyLm(Tables.documents(spark, dir))
        .orderBy(col("doc_id"))),

    // PMI collocations + word2phrase score (d141): top-k adjacent
    // pairs by pointwise mutual information over the shared bigram
    // table (TextAnalysis.pmiCollocations doc)
    "d141_pmi_collocations" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.pmiCollocations(Tables.documents(spark, dir),
        PMI_K, PMI_MIN, PMI_DELTA)
        .orderBy(col("rank"))),

    // character-entropy quality signal (d142): Shannon entropy of the
    // per-doc character distribution — the gibberish detector
    // (TextAnalysis.charEntropy doc)
    "d142_char_entropy" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.charEntropy(Tables.documents(spark, dir))
        .orderBy(col("doc_id"))),

    // C4's badword blocklist rule (d143): drop pages containing a
    // designated word — token-level, scan-side
    // (TextAnalysis.blocklistFilter doc; 'dup' hits 25/500 at sf0.01,
    // 'lorem' exercises the no-hit path)
    "d143_blocklist" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.blocklistFilter(Tables.documents(spark, dir), BLOCK_WORDS)
        .orderBy(col("doc_id"))),

    // Morton (z-order) key derivation (d144): the bit-interleave both
    // the layout and its oracle share, verified on an event slice
    // (ZOrder.zKeySql doc)
    "d144_zorder_key" -> ((spark: SparkSession, dir: String) =>
      ZOrder.eventGrid(Tables.events(spark, dir), Z_BITS)
        .filter(col("event_id") % 100 === 0)
        .select(col("event_id"), col("ux"), col("ty"), col("zkey"))
        .orderBy(col("event_id"))),

    // z-ordered store + pruned rectangle query (d145): the lakehouse
    // multi-column clustering device — overlapping z-buckets derived
    // driver-side from the rectangle, injected as PartitionFilters
    // (plan-guarded); the store must not change the answer, so the
    // oracle is the plain rectangle filter (ZOrder.zRectQuery doc)
    "d145_zorder_query" -> ((spark: SparkSession, dir: String) => {
      val ev = Tables.events(spark, dir)
      val path = indexPath("d145-zorder")
      ZOrder.saveZOrderedStore(ev, path, Z_BITS, Z_BUCKET_BITS)
      ZOrder.zRectQuery(spark, path, Z_UX._1, Z_UX._2, Z_TY._1, Z_TY._2)
        .orderBy(col("event_id"))
    }),

    // clustered ingest (d146): store built on the 3/4-cut history, the
    // rest appended — the bucket is a pure static function of the row,
    // so append ≡ rebuild and the rectangle answer matches d145's
    // oracle verbatim (ZOrder.appendZOrderedStore doc)
    "d146_zorder_appended" -> ((spark: SparkSession, dir: String) => {
      val ev = Tables.events(spark, dir)
      val cut = ev.agg(max(col("event_id"))).head().getLong(0) * 3 / 4
      val path = indexPath("d146-zorder")
      ZOrder.saveZOrderedStore(ev.filter(col("event_id") <= cut), path,
        Z_BITS, Z_BUCKET_BITS)
      ZOrder.appendZOrderedStore(ev.filter(col("event_id") > cut), path)
      ZOrder.zRectQuery(spark, path, Z_UX._1, Z_UX._2, Z_TY._1, Z_TY._2)
        .orderBy(col("event_id"))
    }),

    // TIME-TRAVEL read of the clustered store (d153): build = snapshot
    // v1, append = v2; reading AT v1 is the same pruned rectangle scan
    // plus one watermark cut (id-monotone append-only ⇒ a version IS
    // its watermark) — the lakehouse VERSION AS OF capability at O(1)
    // metadata per version; oracle = the plain rectangle over the
    // history half (ZOrder.zRectQueryAt doc)
    "d153_zorder_time_travel" -> ((spark: SparkSession, dir: String) => {
      val ev = Tables.events(spark, dir)
      val cut = ev.agg(max(col("event_id"))).head().getLong(0) * 3 / 4
      val path = indexPath("d153-zorder")
      ZOrder.saveZOrderedStore(ev.filter(col("event_id") <= cut), path,
        Z_BITS, Z_BUCKET_BITS)
      ZOrder.appendZOrderedStore(ev.filter(col("event_id") > cut), path)
      ZOrder.zRectQueryAt(spark, path, version = 1,
        Z_UX._1, Z_UX._2, Z_TY._1, Z_TY._2)
        .orderBy(col("event_id"))
    }),

    // CCNet's head/middle/tail terciles over d45, ranked with the
    // distributed global-rank device (bucket-partitioned windows +
    // per-bucket base offsets — parallelism bounded by the grid, never
    // 1; TextAnalysis.perplexityTiers doc)
    "d46_ppl_tiers" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.perplexityTiers(Tables.documents(spark, dir), LM_SCALE)
        .orderBy(col("doc_id"))),

    // token-BUDGETED sharding: equal-token shard files over a
    // deterministic hash60 shuffle order, start positions from the
    // bucketed distributed prefix-sum (Packing object doc) — the
    // uniform-bytes layout d20's hash-assigned shards can't give
    "d47_token_shards" -> ((spark: SparkSession, dir: String) =>
      Packing.tokenShards(Tables.documents(spark, dir), SHARD_BUDGET)
        .orderBy(col("doc_id"))),

    // GLOBAL concat-and-chunk sequence packing: docs split across
    // fixed ctx windows of the shuffled corpus-wide token stream, one
    // row per (doc, window) span (Packing.packSequences doc; contrast
    // d20 per-shard streams / d23 per-doc overlapping chunks)
    "d48_pack_ctx" -> ((spark: SparkSession, dir: String) =>
      Packing.packSequences(Tables.documents(spark, dir), CTX_LEN)
        .orderBy(col("ctx_id"), col("doc_id"))),

    // whole-document fold pairing (d121): longest folds onto shortest,
    // no doc ever crosses a bin boundary; length-bucketed rank device
    // (Packing.pairPack doc)
    "d121_pair_pack" -> ((spark: SparkSession, dir: String) =>
      Packing.pairPack(Tables.documents(spark, dir), PAIR_CTX)
        .orderBy(col("doc_id"))),

    // padding bill of paired vs singleton vs concat layouts at one
    // context length (Packing.packEfficiency doc)
    "d122_pack_efficiency" -> ((spark: SparkSession, dir: String) =>
      Packing.packEfficiency(Tables.documents(spark, dir), PAIR_CTX)
        .orderBy(col("strategy"))),

    // length-bucketed dynamic batching (d126): batches pad only to
    // their own max length; fully key-partitioned
    // (Packing.bucketBatches doc)
    "d126_bucket_batches" -> ((spark: SparkSession, dir: String) =>
      Packing.bucketBatches(Tables.documents(spark, dir), BATCH_B, BUCKET_W)
        .orderBy(col("doc_id"))),

    // dynamic-batching padding bill: bucketed vs arrival-order batching
    // (Packing.bucketBatchStats doc)
    "d127_batch_pad" -> ((spark: SparkSession, dir: String) =>
      Packing.bucketBatchStats(Tables.documents(spark, dir), BATCH_B,
        BUCKET_W)
        .orderBy(col("strategy"))),

    // the CCNet deployment shape proper: LM trained once on the
    // trusted reference slice (lang='en'), persisted with the shared
    // manifest device, then scoring the WHOLE corpus cross-domain with
    // three-tier add-one OOV backoff (TextAnalysis.saveBigramLm /
    // bigramLmScoreIndexed docs)
    "d49_bigram_lm_xdomain" -> ((spark: SparkSession, dir: String) => {
      val docs = Tables.documents(spark, dir)
      val path = indexPath("d49-lm")
      TextAnalysis.saveBigramLm(docs.filter(col("lang") === "en"), path)
      TextAnalysis.bigramLmScoreIndexed(docs, path)
        .orderBy(col("doc_id"))
    }),

    // the packing tail made durable: equal-token shards written as a
    // shard_id-partitioned parquet store (manifest device), read back
    // whole and summarized per shard with an order-independent content
    // digest — the round trip through disk must be invisible
    // (Packing.saveTokenShards doc; single-shard pruning spec-asserted)
    "d50_shard_store" -> ((spark: SparkSession, dir: String) => {
      val docs = Tables.documents(spark, dir)
      val path = indexPath("d50-shards")
      Packing.saveTokenShards(docs, path, SHARD_BUDGET)
      graft.sources.IndexManifest.require(path, "shards")
      spark.read.parquet(s"$path/shards")
        .withColumn("h", Dedup.hash60(col("text")))
        .groupBy(col("shard_id").cast("long").as("shard_id"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_tokens")).cast("long").as("n_tokens"),
          expr("bit_xor(h)").as("text_h"))
        .orderBy(col("shard_id"))
    }),

    // DSIR importance weights (d53): target-vs-corpus model contrast
    // per doc — the published importance-resampling log-ratio, with
    // the sign gate compared on exact DECIMAL sums and exp()
    // deliberately left out of the cross-engine contract
    // (TextAnalysis.dsirWeights doc). Target domain = lang='en', the
    // d49 trusted-reference device.
    "d53_dsir_weights" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.dsirWeights(Tables.documents(spark, dir),
        col("lang") === "en")
        .orderBy(col("doc_id"))),

    // DSIR selection (d54): the resampling half as a deterministic
    // rank cut — d53's weights through the d46 distributed-rank
    // device, top third selected (TextAnalysis.dsirSelect doc)
    "d54_dsir_select" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.dsirSelect(Tables.documents(spark, dir),
        col("lang") === "en", LM_SCALE)
        .orderBy(col("doc_id"))),

    // the GROWN shard store (d51): history shards frozen at the 3/4
    // cut, the rest appended AFTER the frozen token stream with
    // Packing.appendTokenShards (existing files never rewritten —
    // Round10OpsSpec pins file-level no-recompute), the whole store
    // summarized per shard like d50. requireFresh proves the manifest
    // watermark advanced to the grown corpus. The oracle recomputes the
    // documented two-stage placement (history chain verbatim, increment
    // chain offset by the history total) — NOT a full rebuild, which
    // would re-interleave the global shuffle (appendTokenShards doc).
    "d51_shard_append" -> ((spark: SparkSession, dir: String) => {
      val docs = Tables.documents(spark, dir)
      val cut = docs.agg(max(col("doc_id"))).head().getLong(0) * 3 / 4
      val path = indexPath("d51-shards")
      Packing.saveTokenShards(docs.filter(col("doc_id") <= cut), path, SHARD_BUDGET)
      Packing.appendTokenShards(docs.filter(col("doc_id") > cut), path)
      graft.sources.IndexManifest.requireFresh(path, docs, "doc_id")
      spark.read.parquet(s"$path/shards")
        .withColumn("h", Dedup.hash60(col("text")))
        .groupBy(col("shard_id").cast("long").as("shard_id"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_tokens")).cast("long").as("n_tokens"),
          expr("bit_xor(h)").as("text_h"))
        .orderBy(col("shard_id"))
    }),

    // the shard-store CONSUMER (d55): context windows cut within each
    // persisted shard independently — local position 0 per shard, the
    // only window partitioned by shard_id (bounded at ~budget tokens by
    // the shard contract), no corpus-wide prefix sum
    // (Packing.packShardStore doc; contrast d48's global stream)
    "d55_pack_shards" -> ((spark: SparkSession, dir: String) => {
      val docs = Tables.documents(spark, dir)
      val path = indexPath("d55-shards")
      Packing.saveTokenShards(docs, path, SHARD_BUDGET)
      Packing.packShardStore(spark, path, CTX_LEN)
        .orderBy(col("shard_id"), col("ctx_id"), col("doc_id"))
    }),

    // TIME-TRAVEL read of the training-shard store (d155) — "the exact
    // shard set training run X consumed": history build = snapshot v1,
    // append = v2, the d50 per-shard summary read AT v1 — one pushed
    // doc_id cut over the grown store, O(1) metadata, frozen history
    // start_tokens verbatim (Packing.readShardStoreAt doc); oracle =
    // the d50 summary chain over the history cut
    "d155_shard_time_travel" -> ((spark: SparkSession, dir: String) => {
      val path = shardStoreVersioned(spark, dir)
      Packing.readShardStoreAt(spark, path, 1)
        .withColumn("h", Dedup.hash60(col("text")))
        .groupBy(col("shard_id").cast("long").as("shard_id"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_tokens")).cast("long").as("n_tokens"),
          expr("bit_xor(h)").as("text_h"))
        .orderBy(col("shard_id"))
    }),

    // the snapshot-PINNED packing consumer (d156): pack exactly the
    // context windows run X's dataloader saw, from today's grown store —
    // the d55 per-shard window chain over the v1 cut; bit-stability vs
    // the pre-append store is spec-pinned (Packing.packShardStoreAt doc)
    "d156_pack_shards_asof" -> ((spark: SparkSession, dir: String) => {
      val path = shardStoreVersioned(spark, dir)
      Packing.packShardStoreAt(spark, path, 1, CTX_LEN)
        .orderBy(col("shard_id"), col("ctx_id"), col("doc_id"))
    }),

    // VERSION DIFF of the shard store (d158): the exact document/token
    // increment between snapshots v1 and v2 — one pushed watermark
    // interval on the id-monotone store (no row compare, no join),
    // summarized per shard; the audit row beside "retrained on version
    // N" in a dataset card. Oracle = the d51 increment-placement chain
    // alone (Packing.shardStoreDiff doc)
    "d158_shard_version_diff" -> ((spark: SparkSession, dir: String) => {
      val path = shardStoreVersioned(spark, dir)
      Packing.shardStoreDiff(spark, path, 1, 2)
        .withColumn("h", Dedup.hash60(col("text")))
        .groupBy(col("shard_id").cast("long").as("shard_id"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_tokens")).cast("long").as("n_tokens"),
          expr("bit_xor(h)").as("text_h"))
        .orderBy(col("shard_id"))
    }),

    // the Gopher document-quality rule suite (d56): the published
    // filter set as one scan-side pass — word-count bounds, mean
    // word-length bounds, symbol/bullet/ellipsis ratios, alphabetic
    // fraction, stopword rule. The stop list is the corpus's marker
    // vocabulary (the published English list is degenerate on this
    // synthetic vocab — measured 0/500 docs with >=2 hits); thresholds
    // stay the published constants (TextAnalysis.gopherRules doc)
    "d56_gopher_rules" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.gopherRules(Tables.documents(spark, dir),
        stopWords = TextAnalysis.markers.head._2)
        .orderBy(col("doc_id"))),

    // C4 line-level cleaning (d57): terminal-punctuation line keep +
    // doc-level brace/lorem gates, all scan-side array expressions.
    // The corpus has no sentence punctuation (measured), so this row
    // verifies the all-drop path cross-engine; line semantics are
    // spec-proven on constructed docs (TextAnalysis.c4LineFilter doc)
    "d57_c4_filter" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.c4LineFilter(Tables.documents(spark, dir))
        .orderBy(col("doc_id"))),

    // BPE pair statistics (d58): adjacent-symbol-pair corpus counts
    // over the deduplicated weighted vocabulary, end-of-word marker
    // included — rank 1 is the first BPE merge
    // (TextAnalysis.bpePairStats doc; contrast d15's word-level vocab)
    "d58_bpe_pairs" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.bpePairStats(Tables.documents(spark, dir), BPE_TOPK)
        .orderBy(col("rank"))),

    // BPE training (d59): count → take max → merge corpus-wide,
    // iterated — the merge table a BPE tokenizer ships. Each merge is
    // one literal replace on the separator representation, so the
    // whole trajectory is oracle-reproducible as chained CTE stages
    // (TextAnalysis.bpeTrain doc)
    "d59_bpe_train" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.bpeTrain(Tables.documents(spark, dir), BPE_MERGES)
        .orderBy(col("step"))),

    // Gopher repetition suite (d60): the published character-fraction
    // repetition signals (dup-line fractions, top-{2,3,4}-gram char
    // coverage) with the published thresholds — all per-row array
    // lambdas, zero shuffle (TextAnalysis.gopherRepetition doc;
    // complements d14's count-share signals)
    "d60_gopher_repetition" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.gopherRepetition(Tables.documents(spark, dir))
        .orderBy(col("doc_id"))),

    // BPE encode (d61): d59's merge table applied to the corpus —
    // merges at vocabulary scale, docs equi-join their words to the
    // encoded vocab, per-doc token accounting out
    // (TextAnalysis.bpeEncode doc)
    "d61_bpe_encode" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.bpeEncode(Tables.documents(spark, dir), BPE_MERGES)
        .orderBy(col("doc_id"))),

    // persisted BPE model (d113): train-once merge store (manifest
    // kind "bpe"), encode path shared with d61 verbatim — registered
    // against d61's oracle text (TextAnalysis.saveBpeModel /
    // bpeEncodeIndexed docs)
    "d113_bpe_indexed" -> ((spark: SparkSession, dir: String) => {
      val docs = Tables.documents(spark, dir)
      bpeCached(spark, dir) // build if stale
      TextAnalysis.bpeEncodeIndexed(spark,
        indexPath("d113-bpe/" + dir.replaceAll("[^A-Za-z0-9._-]", "_")), docs)
        .orderBy(col("doc_id"))
    }),

    // WordPiece greedy segmentation (d137): BERT's maximal-munch walk
    // over the BPE-derived piece vocabulary (merge results + alphabet)
    // — the third tokenizer family; one scan-side fold per distinct
    // word (TextAnalysis.wordPieceSegments doc)
    "d137_wordpiece_vocab" -> ((spark: SparkSession, dir: String) => {
      val docs = Tables.documents(spark, dir)
      TextAnalysis.wordPieceSegments(docs, bpeCached(spark, dir))
        .orderBy(col("word"))
    }),

    // greedy-vs-merge-order disagreement per doc (d138): token counts
    // under both serving algorithms over ONE shared piece vocabulary
    "d138_wordpiece_encode" -> ((spark: SparkSession, dir: String) => {
      val docs = Tables.documents(spark, dir)
      TextAnalysis.wordPieceEncode(docs, bpeCached(spark, dir))
        .orderBy(col("doc_id"))
    }),

    // curriculum token shards (d62): the d47 layout with the shuffle
    // order reordered by d46 quality tier — head shards first, tiers
    // contiguous by construction, within-tier order the shared hash60
    // shuffle (Packing.curriculumShards doc)
    "d62_curriculum_shards" -> ((spark: SparkSession, dir: String) =>
      Packing.curriculumShards(Tables.documents(spark, dir), SHARD_BUDGET,
        lmScale = LM_SCALE)
        .orderBy(col("doc_id"))),

    // cross-document line dedup (d63): keep-first per line corpus-wide,
    // docs rebuilt from survivors. The registered corpus unions exact
    // twin copies (id + 1000000) of the even docs so keep-first has
    // real work: originals survive intact, twins empty out
    // (Dedup.lineDedup doc)
    "d63_line_dedup" -> ((spark: SparkSession, dir: String) => {
      val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      val twins = docs.filter(col("doc_id") % 2 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      Dedup.lineDedup(docs.unionByName(twins))
        .orderBy(col("doc_id"))
    }),

    // BPE segmentation spans (d64): the per-word token lookup table
    // after d59's merges — symbols with char offsets tiling the marked
    // word exactly (TextAnalysis.bpeSpans doc)
    "d64_bpe_spans" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.bpeSpans(Tables.documents(spark, dir), BPE_MERGES)
        .orderBy(col("word"), col("tok_idx"))),

    // per-stratum tokenizer compression (d66): tokens-per-word by
    // language after whole-corpus BPE — the fairness audit motivating
    // UniMax mixtures (TextAnalysis.bpeFairness doc)
    "d66_bpe_fairness" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.bpeFairness(Tables.documents(spark, dir), BPE_MERGES)
        .orderBy(col("stratum"))),

    // corpus-level boilerplate signal: fraction of each doc's 3-gram
    // spans seen in some OTHER doc (Dedup.dupSpans doc)
    "d18_dup_spans" -> ((spark: SparkSession, dir: String) =>
      Dedup.dupSpans(Tables.documents(spark, dir))
        .orderBy(col("doc_id"))),

    // concat-and-chunk sequence packing: per-shard running token sums →
    // fixed-length window assignment (Curation.packPlan doc)
    "d20_pack_plan" -> ((spark: SparkSession, dir: String) =>
      Curation.packPlan(Tables.documents(spark, dir), PACK_SHARDS, PACK_SEQLEN)
        .orderBy(col("doc_id"))),

    // UniMax epoch-capped mixture (d65): uniform-as-possible budget
    // split with a repetition cap per language stratum — waterfilling
    // in ascending-cap order (Curation.unimaxMixture doc; contrast
    // d24's external-target schedule)
    "d65_unimax" -> ((spark: SparkSession, dir: String) =>
      Curation.unimaxMixture(
        TextAnalysis.langId(Tables.documents(spark, dir)), col("pred_lang"),
        UNIMAX_BUDGET, UNIMAX_EPOCHS)
        .orderBy(col("stratum"))),

    // UniMax realization (d82): d65's allocations turned into a
    // deterministic per-stratum document keep-list — the per-stratum
    // prefix-sum device, boundary doc rides the budget
    // (Curation.unimaxSelect doc)
    "d82_unimax_select" -> ((spark: SparkSession, dir: String) =>
      Curation.unimaxSelect(
        TextAnalysis.langId(Tables.documents(spark, dir)), col("pred_lang"),
        UNIMAX_BUDGET, UNIMAX_EPOCHS)
        .orderBy(col("doc_id"))),

    // Heaps-law vocabulary growth (d83): distinct words vs tokens at
    // hash-order prefix checkpoints, local exponent β via the
    // DECIMAL(28,8) ln device (TextAnalysis.heapsCurve doc)
    "d83_heaps_curve" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.heapsCurve(Tables.documents(spark, dir))
        .orderBy(col("chk"))),

    // LSH band-coverage curve (d84): candidate recall of the exact
    // ≥0.5-Jaccard pairs vs band count over the d04/d52 slice — nested
    // band prefixes make it nondecreasing by construction
    // (Dedup.lshBandCurve doc)
    "d84_lsh_band_curve" -> ((spark: SparkSession, dir: String) =>
      Dedup.lshBandCurve(
        Tables.documents(spark, dir).filter(col("doc_id") % 2 === 0),
        Seq(2, 4, 8, 16), EST_K, EST_BANDS, 0.5, MAX_BUCKET, MAX_DF)
        .orderBy(col("n_bands"))),

    // persisted BM25 inverted index (d87): postings/lengths/constants
    // built once, queries answered from probes with the batch kernel's
    // exact expression form — per-term contributions pivoted to columns
    // so float addition order is preserved; registered against d17's
    // oracle verbatim (TextAnalysis.saveBm25Index / bm25Indexed docs)
    "d87_bm25_indexed" -> ((spark: SparkSession, dir: String) => {
      val path = indexPath("d87-bm25")
      TextAnalysis.saveBm25Index(Tables.documents(spark, dir), path)
      TextAnalysis.bm25Indexed(spark, path, BM25_TERMS)
        .orderBy(col("doc_id"))
    }),

    // content-level context assembly (d92): each d48 window's token
    // payload sliced from the source docs, ordered by in-window
    // position, digested — an off-by-one anywhere in the packing
    // arithmetic breaks a hashed VALUE, not a count
    // (Packing.packedContexts doc)
    "d92_pack_content" -> ((spark: SparkSession, dir: String) =>
      Packing.packedContexts(Tables.documents(spark, dir), CTX_LEN)
        .orderBy(col("ctx_id"))),

    // composed-pipeline drop accounting (d93): keepSummary one level
    // up — per-leg admission counts over the persisted d85 verdict
    // artifact (Curation.fullVerdictSummary doc)
    "d93_verdict_summary" -> ((spark: SparkSession, dir: String) =>
      Curation.fullVerdictSummary(verdictCached(spark, dir))),

    // curated-store SYNC (d91): the maintenance policy for a store
    // whose membership is a SELECTION (not append-only) — history
    // built on the 3/4 corpus under a prefix-stable verdict, the grown
    // corpus synced in (membership-identity check below the watermark,
    // then the d51 frozen-history append), second sync fresh. The
    // oracle recomputes the documented two-stage placement over the
    // selected subsets (Packing.curatedShardsSync doc)
    "d91_curated_sync" -> ((spark: SparkSession, dir: String) => {
      val docs = Tables.documents(spark, dir)
      val cut = docs.agg(max(col("doc_id"))).head().getLong(0) * 3 / 4
      val sel = docs.select(col("doc_id")).filter(col("doc_id") % 3 === 0)
      val path = indexPath("d91-curated")
      Packing.saveCuratedShards(docs.filter(col("doc_id") <= cut), sel,
        path, SHARD_BUDGET)
      val grow = Packing.curatedShardsSync(docs, sel, path, SHARD_BUDGET)
      require(grow == "append", s"expected append, got $grow")
      require(Packing.curatedShardsSync(docs, sel, path, SHARD_BUDGET)
        == "fresh", "second sync must be fresh")
      spark.read.parquet(s"$path/shards")
        .select(col("doc_id"), col("n_tokens"), col("start_token"),
          col("shard_id").cast("long").as("shard_id"))
        .orderBy(col("doc_id"))
    }),

    // term-bucketed BM25 postings (d90): the d87 scaladoc's 100 TB
    // layout made real — postings PARTITIONED BY hash60(term) % 16,
    // each query term's bucket derived driver-side (hash60Jvm) and
    // injected as a literal, so unprobed bucket directories prune at
    // the file index (PartitionFilters, plan-guarded) and the term
    // filter pushes within; scores stay bit-identical — registered
    // against d17's oracle verbatim (saveBm25Index/bm25Indexed docs)
    "d90_bm25_bucketed" -> ((spark: SparkSession, dir: String) => {
      val path = indexPath("d90-bm25")
      TextAnalysis.saveBm25Index(Tables.documents(spark, dir), path,
        termBuckets = 16)
      TextAnalysis.bm25Indexed(spark, path, BM25_TERMS)
        .orderBy(col("doc_id"))
    }),

    // BM25 index APPEND + sync (d159): the round-13 mergeable-stats
    // lesson retiring this store's rebuild-only stance — postings/lens
    // rows append (history frozen), the constants merge as exact
    // integer sums, and the appended index serves scores BIT-IDENTICAL
    // to a rebuild on the grown corpus: registered against d17's
    // oracle verbatim (the equality IS the claim)
    // (TextAnalysis.appendBm25Index / bm25IndexSync docs)
    "d159_bm25_appended" -> ((spark: SparkSession, dir: String) => {
      val docs = Tables.documents(spark, dir)
      val cut = docs.agg(max(col("doc_id"))).head().getLong(0) * 3 / 4
      val path = indexPath("d159-bm25")
      TextAnalysis.saveBm25Index(docs.filter(col("doc_id") <= cut), path)
      val a1 = TextAnalysis.bm25IndexSync(docs, path)
      require(a1 == "append", s"first sync took '$a1', expected append")
      val a2 = TextAnalysis.bm25IndexSync(docs, path)
      require(a2 == "fresh", s"second sync took '$a2', expected fresh")
      TextAnalysis.bm25Indexed(spark, path, BM25_TERMS)
        .orderBy(col("doc_id"))
    }),

    // BM25 TIME TRAVEL (d160): "the ranking run X saw" — a version
    // pins its own ranking FUNCTION (postings/lens doc_id cut + THAT
    // version's n_docs/sum_dl constants off the version manifest), so
    // the as-of read reproduces version-1 scores exactly, not today's
    // idf/avgdl over yesterday's documents; oracle = the d17 chain
    // over the history slice (TextAnalysis.bm25Indexed asOf doc)
    "d160_bm25_time_travel" -> ((spark: SparkSession, dir: String) => {
      val docs = Tables.documents(spark, dir)
      val cut = docs.agg(max(col("doc_id"))).head().getLong(0) * 3 / 4
      val path = indexPath("d160-bm25")
      TextAnalysis.saveBm25Index(docs.filter(col("doc_id") <= cut), path)
      TextAnalysis.appendBm25Index(docs.filter(col("doc_id") > cut), path)
      TextAnalysis.bm25Indexed(spark, path, BM25_TERMS,
        asOfVersion = Some(1))
        .orderBy(col("doc_id"))
    }),

    // conjunctive BM25 retrieval (d94): AND semantics — candidates are
    // the postings-lists intersection (tf pivoted per term over the
    // pushed probe, all non-null), ONLY candidates scored, the d89
    // heap cut on top (TextAnalysis.bm25TopKAll doc)
    "d94_bm25_topk_all" -> ((spark: SparkSession, dir: String) => {
      val path = indexPath("d94-bm25")
      TextAnalysis.saveBm25Index(Tables.documents(spark, dir), path,
        termBuckets = 16)
      TextAnalysis.bm25TopKAll(spark, path, BM25_TERMS, BM25_TOPK)
        .orderBy(col("rk"))
    }),

    // BM25 top-k retrieval (d89): the SERVING shape of the d87 inverted
    // index — per query, the k best documents via TakeOrderedAndProject
    // over the pushed postings probe (plan-guarded), scores from the
    // d17/d87 bit-identical expression; oracle = brute-force rank cut
    // per query (TextAnalysis.bm25TopKIndexed doc)
    "d89_bm25_topk" -> ((spark: SparkSession, dir: String) => {
      val path = indexPath("d89-bm25")
      // served from the d90 bucketed layout: at scale the top-k rides
      // the pruned probe (PartitionFilters + pushed term filter + heap
      // cut compose — all three plan-guarded)
      TextAnalysis.saveBm25Index(Tables.documents(spark, dir), path,
        termBuckets = 16)
      TextAnalysis.bm25TopKIndexed(spark, path, BM25_QUERIES, BM25_TOPK)
        .orderBy(col("query_id"), col("rk"))
    }),

    // margin rank-cut classifier selection (d86): the d54 budget-cut
    // device over the d69 margins — the published quality-classifier
    // deployment shape (a score budget, not the raw sign rule, which
    // this corpus measures as degenerate all-negative)
    // (Classifier.classifySelectTop doc)
    "d86_classifier_topcut" -> ((spark: SparkSession, dir: String) =>
      Classifier.classifySelectTop(Tables.documents(spark, dir),
        col("lang") === "en", CLS_BUCKETS, CLS_PASSES)
        .orderBy(col("doc_id"))),

    // full-curation composition (d85): the pipeline a training-data run
    // actually executes, as ONE verdict row per train doc — the d19
    // keep-list (dedup-rep / decontam / repetition / copy / sample
    // gates), the d46 perplexity tier, and the d86 classifier top-half
    // cut, composed into the final selection: keep AND tier <> 'tail'
    // AND top-half-by-margin (the CCNet head+middle convention under a
    // trained quality budget). Every leg is a factored shared chain on
    // BOTH engines, so the composition cannot drift from its parts.
    "d85_full_curation" -> ((spark: SparkSession, dir: String) =>
      // round 11: served from the persisted full-verdict artifact
      // (Curation.fullVerdictCached) — the warm path is one parquet
      // read; the build path is the same three factored legs as ever,
      // so the oracle is unchanged
      verdictCached(spark, dir).orderBy(col("doc_id"))),

    // curated-corpus materialization (d88): the last-mile composition —
    // d85's `selected` verdict filters the corpus, survivors are
    // prefix-summed from token 0 and written as the d50 shard store
    // (manifest + pruned single-shard reads); the registered row is the
    // store's placement table read back (Packing.saveCuratedShards doc).
    // Measured caveat (the d32/d57/d84 pattern): this corpus's tiny
    // shared vocabulary makes the decontamination gate brutal — 3
    // survivors at sf0.01, ZERO at sf0.1 (keepSummary: n_contaminated
    // = n_train) — so the registered row pins the composition and the
    // (legitimate) near-empty regime, including the schema-only empty
    // store; the substantive-store behavior is spec-proven on a
    // 1/3-of-corpus synthetic selection (Round11OpsSpec) and d91's
    // registered row drives it at 1667 rows
    "d88_curated_store" -> ((spark: SparkSession, dir: String) => {
      val docs = Tables.documents(spark, dir)
      val sel = verdictCached(spark, dir)
        .filter(col("selected")).select(col("doc_id"))
      val path = indexPath("d88-curated")
      Packing.saveCuratedShards(docs, sel, path, SHARD_BUDGET)
      graft.sources.IndexManifest.require(path, "shards")
      spark.read.parquet(s"$path/shards")
        .select(col("doc_id"), col("n_tokens"), col("start_token"),
          col("shard_id").cast("long").as("shard_id"))
        .orderBy(col("doc_id"))
    }),

    // deterministic epoch shuffle (d95): per-epoch hash60 permutation
    // + distributed-rank round-robin into loader shards — the
    // dataloader-facing order of a multi-epoch run (Sampling.epochShuffle
    // doc)
    "d95_epoch_shuffle" -> ((spark: SparkSession, dir: String) =>
      Sampling.epochShuffle(Tables.documents(spark, dir), EPOCHS,
        LOADER_SHARDS)
        .orderBy(col("epoch"), col("rk"))),

    // deterministic train/val/test split (d96): membership by where
    // hash60(salt:doc_id) lands among BigDecimal-exact cumulative
    // cutoffs of the 60-bit hash space — disjoint + exhaustive by
    // construction, stable under corpus growth (Sampling.hashSplit doc)
    "d96_hash_split" -> ((spark: SparkSession, dir: String) =>
      Sampling.hashSplit(Tables.documents(spark, dir), SPLIT_SALT,
        SPLIT_FRACS)
        .orderBy(col("doc_id"))),

    // systematic resampling with replacement (d97): n evenly-spaced
    // probe points over the d47 token prefix-sum stream, each selecting
    // its containing document via the bin-bucketed range join — the
    // minimum-variance token-proportional draw, RNG-free
    // (Sampling.systematicResample doc)
    "d97_systematic_resample" -> ((spark: SparkSession, dir: String) =>
      Sampling.systematicResample(Tables.documents(spark, dir), RESAMPLE_N)
        .orderBy(col("sample_id"))),

    // unigram-LM tokenizer training (d101): Viterbi hard-EM over the
    // wc-weighted vocabulary — the SentencePiece family beside BPE;
    // served from the shared per-dir artifact slot (the d85 pattern:
    // d101-d104 read ONE store, whichever runs first pays the EM)
    // (Unigram.unigramTrain / unigramModelCached docs)
    "d101_unigram_train" -> ((spark: SparkSession, dir: String) =>
      uniModelCached(spark, dir)
        .select(col("piece"), col("cnt"), col("nll").cast("double").as("nll"))
        .orderBy(col("piece"))),

    // unigram-LM encode audit (d102): per-doc word/piece counts and
    // fertility under the trained model's Viterbi segmentation
    // (Unigram.encodeWithModel doc)
    "d102_unigram_encode" -> ((spark: SparkSession, dir: String) =>
      Unigram.encodeWithModel(Tables.documents(spark, dir),
        uniModelCached(spark, dir), UNI_L)
        .orderBy(col("doc_id"))),

    // persisted unigram model (d104): train-once store (manifest kind
    // "unigram-lm"), encode served from the stored costs — registered
    // against d102's oracle verbatim (Unigram.saveUnigramModel /
    // unigramEncodeIndexed docs)
    "d104_unigram_indexed" -> ((spark: SparkSession, dir: String) => {
      val docs = Tables.documents(spark, dir)
      val path = uniModelPath(dir)
      Unigram.unigramModelCached(docs, path, UNI_L, UNI_EM) // build if stale
      Unigram.unigramEncodeIndexed(spark, path, docs)
        .orderBy(col("doc_id"))
    }),

    // per-document suffix array by prefix doubling (d105): log rounds
    // of (doc_id, pos+k) self-joins + per-doc dense ranks, served from
    // the persisted per-dir artifact; oracle sorts materialized suffix
    // strings (TextAnalysis.suffixArray / saveSuffixIndex docs)
    "d105_suffix_array" -> ((spark: SparkSession, dir: String) =>
      sfxCached(spark, dir, global = false)._1
        .select(col("doc_id"), col("pos"), col("rnk"))
        .orderBy(col("doc_id"), col("pos"))),

    // adjacent-suffix LCP array (d106): sparse-table binary descent
    // over the doubling ladder; oracle compares materialized adjacent
    // suffix word-arrays elementwise (TextAnalysis.suffixLcp doc)
    "d106_suffix_lcp" -> ((spark: SparkSession, dir: String) =>
      sfxCached(spark, dir, global = false)._2
        .select(col("doc_id"), col("rnk"), col("pos"), col("lcp"))
        .orderBy(col("doc_id"), col("rnk"))),

    // longest intra-document repeat + verdict (d107): max over the LCP
    // array — exact self-repetition beside the d60 heuristics
    // (TextAnalysis.longestRepeat doc)
    "d107_longest_repeat" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.longestRepeatFrom(Tables.documents(spark, dir),
        sfxCached(spark, dir, global = false)._2, LREP_MAX)
        .orderBy(col("doc_id"))),

    // generalized corpus-level suffix array (d108): one dense rank
    // order over every suffix of every doc — ranking via the bucketed
    // distributed dense rank, identical cross-doc suffixes share a
    // rank (TextAnalysis.globalSuffixArray doc)
    "d108_global_suffix_array" -> ((spark: SparkSession, dir: String) =>
      sfxCached(spark, dir, global = true)._1
        .select(col("doc_id"), col("pos"), col("rnk"))
        .orderBy(col("doc_id"), col("pos"))),

    // adjacent-class LCP + class stats over the generalized SA (d109)
    // (TextAnalysis.globalSuffixLcp doc)
    "d109_global_suffix_lcp" -> ((spark: SparkSession, dir: String) =>
      sfxCached(spark, dir, global = true)._2
        .select(col("rnk"), col("lcp"), col("n_occ"), col("n_docs"))
        .orderBy(col("rnk"))),

    // per-doc longest cross-document duplicated span + verdict (d110):
    // the ExactSubstr contamination metric off the generalized SA
    // (TextAnalysis.crossDocRepeat doc)
    "d110_crossdoc_repeat" -> ((spark: SparkSession, dir: String) => {
      val (sa, lcp) = sfxCached(spark, dir, global = true)
      TextAnalysis.crossDocRepeatFrom(Tables.documents(spark, dir), sa,
        lcp, CROSS_CONTAM)
        .orderBy(col("doc_id"))
    }),

    // per-doc suffix store incremental append (d114): build on a
    // prefix, append the id-monotone rest, serve the full LCP array —
    // d106's oracle verbatim; per-doc independence makes append ≡
    // rebuild bit-exact (TextAnalysis.appendSuffixIndex doc)
    "d114_suffix_appended" -> ((spark: SparkSession, dir: String) => {
      // quarter slice: maintenance-pricing convention (d78/d79) — the
      // round trip's semantics don't need the full corpus re-laddered
      // per bench run
      val docs = Tables.documents(spark, dir).filter(col("doc_id") % 4 === 0)
      val cut = docs.agg(max(col("doc_id"))).head().getLong(0) * 3 / 4
      val path = indexPath("d114-sfx")
      TextAnalysis.saveSuffixIndex(docs.filter(col("doc_id") <= cut), path,
        global = false)
      TextAnalysis.appendSuffixIndex(docs.filter(col("doc_id") > cut), path)
      spark.read.parquet(s"$path/lcp")
        .select(col("doc_id"), col("rnk"), col("pos"), col("lcp"))
        .orderBy(col("doc_id"), col("rnk"))
    }),

    // per-doc suffix store sync (d115): partial build, one sync that
    // must append, one that must no-op, then serve — d106's oracle
    // verbatim (TextAnalysis.suffixIndexSync doc)
    "d115_suffix_sync" -> ((spark: SparkSession, dir: String) => {
      val docs = Tables.documents(spark, dir).filter(col("doc_id") % 4 === 0)
      val cut = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
      val path = indexPath("d115-sfx")
      TextAnalysis.saveSuffixIndex(docs.filter(col("doc_id") <= cut), path,
        global = false)
      val a1 = TextAnalysis.suffixIndexSync(docs, path)
      val a2 = TextAnalysis.suffixIndexSync(docs, path)
      require(a1 == "append" && a2 == "fresh",
        s"sync policy drifted: got ($a1, $a2), expected (append, fresh)")
      spark.read.parquet(s"$path/lcp")
        .select(col("doc_id"), col("rnk"), col("pos"), col("lcp"))
        .orderBy(col("doc_id"), col("rnk"))
    }),

    // overlapping token-window chunking (d112): the RAG/embedding prep
    // step — scan-side expression work only (TextAnalysis.chunkDocs
    // doc)
    "d112_chunking" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.chunkDocs(Tables.documents(spark, dir), CHUNK_W, CHUNK_S)
        .orderBy(col("doc_id"), col("chunk_id"))),

    // token-distribution drift report (d119): JS divergence + OOV
    // masses between two corpus slices (TextAnalysis.tokenDrift doc)
    "d119_token_drift" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.tokenDrift(Tables.documents(spark, dir),
        col("doc_id") % 2 === 0)),

    // embedding-distribution drift report (e51): per-dim decimal
    // moments of two slices folded into one monitoring row
    // (Similarity.embedDrift doc)
    "e51_embed_drift" -> ((spark: SparkSession, dir: String) =>
      Similarity.embedDrift(Tables.embeddings(spark, dir),
        col("vec_id") % 2 === 0)),

    // maximal-marginal-relevance rerank (e52): diversity stage over the
    // cosine top-12 pool for query vector 0 — distributed pool +
    // bounded pairwise sims, request-bounded greedy selection
    // (Similarity.mmrRerank doc)
    "e52_mmr_rerank" -> ((spark: SparkSession, dir: String) =>
      Similarity.mmrRerank(Tables.embeddings(spark, dir),
        MMR_QID, MMR_POOL, MMR_OUT)
        .orderBy(col("rk"))),

    // e52's 100 TB serving composition made a registered row: the pool
    // from the bucketed ANN join instead of the exact broadcast scan
    // (Similarity.mmrRerankAnn doc)
    "e53_mmr_ann" -> ((spark: SparkSession, dir: String) =>
      Similarity.mmrRerankAnn(Tables.embeddings(spark, dir),
        MMR_QID, MMR_POOL, MMR_OUT, ANN_BITS)
        .orderBy(col("rk"))),

    // cross-modal verdict propagation (d118): embeddings filtered to
    // surviving parent documents — referential cleanup after text
    // curation; consumes the d19 ARTIFACT (Curation.propagateKeep doc)
    "d118_crossmodal_keep" -> ((spark: SparkSession, dir: String) =>
      Curation.propagateKeep(keepCached(spark, dir),
        Tables.embeddings(spark, dir), "vec_id")
        .select(col("vec_id"), col("label").cast("long").as("label"))
        .orderBy(col("vec_id"))),

    // hybrid lexical+dense retrieval via reciprocal-rank fusion (d117):
    // BM25 top-20 for the query terms fused with cosine top-20 for the
    // query vector (vec_id 0 — the shared 0..N-1 id space maps
    // embeddings to documents) by RRF with c=60. The fusion arithmetic
    // is INTEGER micro-units (floor(1e12/(60+r)) — the d81/e50 device):
    // rank fusion needs no float at all, so the fused scores are exact
    // in any engine. Rank-after-cut windows only (both source lists
    // and the fused list are <= 20-row bounded tables).
    "d117_hybrid_rrf" -> ((spark: SparkSession, dir: String) => {
      import org.apache.spark.sql.expressions.Window
      val lex = TextAnalysis.bm25(Tables.documents(spark, dir), BM25_TERMS)
        .orderBy(col("score").desc, col("doc_id")).limit(FUSE_K)
        .select(col("doc_id"), row_number().over(
          Window.orderBy(col("score").desc, col("doc_id"))).cast("long").as("r"))
        .select(col("doc_id"),
          expr(s"CAST($RRF_SCALE DIV (60 + r) AS BIGINT)").as("s_lex"))
      val dense = Similarity.cosineTopK(Tables.embeddings(spark, dir),
          col("vec_id") === 0, FUSE_K)
        .select(col("neighbor_id").as("doc_id"),
          expr(s"CAST($RRF_SCALE DIV (60 + rk) AS BIGINT)").as("s_dense"))
      lex.join(dense, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          (coalesce(col("s_lex"), lit(0L)) +
            coalesce(col("s_dense"), lit(0L))).as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id")).limit(FUSE_OUT)
        .select(row_number().over(
            Window.orderBy(col("rrf").desc, col("doc_id"))).cast("long").as("rk"),
          col("doc_id"), col("rrf"))
        .orderBy(col("rk"))
    }),

    // chunk-level BM25 retrieval (d116): the RAG serving story end to
    // end — d112 chunks, keep-first exact chunk dedup (RAG stores
    // dedupe identical chunks), the d17 BM25 tree over the CHUNK
    // corpus, per-query top-k with deterministic tie-break; composite
    // cid = doc_id*1024 + chunk_id decodes back to (doc, chunk)
    "d116_chunk_retrieval" -> ((spark: SparkSession, dir: String) => {
      val chunks = TextAnalysis.chunkDocs(Tables.documents(spark, dir),
          CHUNK_W, CHUNK_S)
        .select((col("doc_id") * 1024L + col("chunk_id")).as("cid"),
          col("chunk_text").as("text"))
      val deduped = chunks.groupBy(col("text")).agg(min(col("cid")).as("cid"))
        .select(col("cid").as("doc_id"), col("text"))
      TextAnalysis.bm25(deduped, BM25_TERMS)
        .orderBy(col("score").desc, col("doc_id")).limit(BM25_TOPK)
        .select(col("doc_id").as("cid"), col("score"))
        .select(expr("cid DIV 1024").cast("long").as("doc_id"),
          expr("cid % 1024").cast("long").as("chunk_id"), col("score"))
        .orderBy(col("score").desc, col("doc_id"), col("chunk_id"))
    }),

    // term-proximity rerank (d124): BM25 pool re-ordered by distinct-
    // term coverage then minimal cover window — the model-free pairwise
    // second stage (TextAnalysis.proximityRerank doc)
    "d124_proximity_rerank" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.proximityRerank(Tables.documents(spark, dir),
        BM25_TERMS, FUSE_K, FUSE_OUT)
        .orderBy(col("rk"))),

    // dataset card (d129): the one-page corpus summary — size, tokens,
    // vocabulary, duplication, stopword mass, language mix
    // (TextAnalysis.datasetCard doc)
    "d129_dataset_card" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.datasetCard(Tables.documents(spark, dir))
        .orderBy(col("metric"))),

    // per-source contribution cap (d130): the anti-domination rule —
    // at most CAP docs per provenance source, deterministic uniform
    // election (Curation.sourceCap doc)
    "d130_source_cap" -> ((spark: SparkSession, dir: String) =>
      Curation.sourceCap(Tables.documents(spark, dir), SOURCE_CAP)
        .orderBy(col("doc_id"))),

    // mergeable dataset card (d132): build on half the corpus, FOLD the
    // other half in as an increment, serve from the store — the
    // registered row IS the merge-exactness proof (oracle recomputes
    // from the full corpus; TextAnalysis.saveCardStore doc)
    "d132_card_store" -> ((spark: SparkSession, dir: String) => {
      val docs = Tables.documents(spark, dir)
      val cut = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
      val path = indexPath("d132-card/" +
        dir.replaceAll("[^A-Za-z0-9._-]", "_"))
      TextAnalysis.saveCardStore(docs.filter(col("doc_id") <= cut), path,
        CARD_P)
      TextAnalysis.appendCardStore(docs.filter(col("doc_id") > cut), path)
      TextAnalysis.cardFromStore(spark, path).orderBy(col("metric"))
    }),

    // the loader capstone (d135): curation verdict → survivors →
    // fold-pack — "curate, then lay the training set out for the
    // dataloader" as ONE registered row (the d85 composition discipline
    // applied to the serving side); the keep leg reads the persisted
    // d19 artifact
    "d135_loader_capstone" -> ((spark: SparkSession, dir: String) => {
      val survivors = Tables.documents(spark, dir).join(
        keepCached(spark, dir).filter(col("keep")).select(col("doc_id")),
        Seq("doc_id"), "left_semi")
      Packing.pairPack(survivors, PAIR_CTX).orderBy(col("doc_id"))
    }),

    // alias-method mixture realization (d134): O(1)-per-slot weighted
    // source draws from the Vose table — the multi-source dataloader's
    // sampler (Sampling.aliasTable/aliasRealize docs)
    "d134_alias_mixture" -> ((spark: SparkSession, dir: String) =>
      Sampling.aliasRealize(spark, ALIAS_W, ALIAS_SLOTS)
        .orderBy(col("slot"))),

    // shard-store integrity audit (d131): every layout invariant
    // checked from the FILES, one row per shard; self-contained build
    // (Packing.shardAudit doc)
    "d131_shard_audit" -> ((spark: SparkSession, dir: String) => {
      val path = indexPath("d131-shards/" +
        dir.replaceAll("[^A-Za-z0-9._-]", "_"))
      Packing.saveTokenShards(Tables.documents(spark, dir), path,
        SHARD_BUDGET)
      Packing.shardAudit(spark, path).orderBy(col("shard_id"))
    }),

    // retrieval-quality evaluation (d128): MRR + precision@k of BM25 vs
    // the proximity rerank against conjunctive term-coverage relevance
    // (TextAnalysis.retrievalEval doc)
    "d128_retrieval_eval" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.retrievalEval(Tables.documents(spark, dir), EVAL_TERMS,
        FUSE_K, FUSE_OUT)
        .orderBy(col("ranker"))),

    // ExactSubstr removal served from the suffix-array artifact (d111):
    // variable-length spans off SA+LCP, registered against d41's
    // oracle VERBATIM — two constructions, one truth
    // (Dedup.exactSubstrFromSuffixIndex doc)
    "d111_exact_substr_sa" -> ((spark: SparkSession, dir: String) => {
      val (sa, lcp) = sfxCached(spark, dir, global = true)
      Dedup.exactSubstrFromSuffixIndex(Tables.documents(spark, dir), sa,
        lcp, EXSUB_LEN)
        .orderBy(col("doc_id"))
    }),

    // Zipf power-law fit (d98): ln-ln least squares over the top-k
    // frequency table — exact decimal moments, fixed double tree
    // (TextAnalysis.zipfSlope doc)
    "d98_zipf_slope" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.zipfSlope(Tables.documents(spark, dir), ZIPF_K)),

    // Count-Min sketch estimates vs truth (d99): depth×width counter
    // grid, min-over-rows estimate, overestimate-by-construction
    // (TextAnalysis.countMinEstimate doc)
    "d99_countmin" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.countMinEstimate(Tables.documents(spark, dir),
        CMS_TERMS, CMS_DEPTH, CMS_WIDTH)
        .orderBy(col("term"))),

    // exact phrase search over the persisted positional index (d100):
    // bucket-pruned pushed probes per phrase term, adjacency as a
    // (doc_id, pos) equi-join chain (TextAnalysis.phraseSearchIndexed
    // doc)
    "d100_phrase_search" -> ((spark: SparkSession, dir: String) => {
      val path = indexPath("d100-pos")
      TextAnalysis.savePositionalIndex(Tables.documents(spark, dir), path,
        termBuckets = 16)
      TextAnalysis.phraseSearchIndexed(spark, path, PHRASE)
        .orderBy(col("doc_id"))
    }),

    // mixture audit: per-language doc/token counts and token share
    // (Curation.mixtureStats doc)
    "d21_mixture_stats" -> ((spark: SparkSession, dir: String) =>
      Curation.mixtureStats(
        TextAnalysis.langId(Tables.documents(spark, dir)), col("pred_lang"))
        .orderBy(col("stratum"))),

    // topical-subset mining: BM25 (raw-odds idf variant — bm25 doc)
    // against a fixed 3-term query; stats broadcast, corpus unshuffled
    "d17_bm25" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.bm25(Tables.documents(spark, dir), BM25_TERMS)
        .orderBy(col("doc_id"))),

    // reproducible mixture sampling: keep-rate per predicted language,
    // membership a pure hash of doc_id (Sampling.stratified doc)
    "d16_stratified_sample" -> ((spark: SparkSession, dir: String) =>
      Sampling.stratified(
        TextAnalysis.langId(Tables.documents(spark, dir))
          .select(col("doc_id"), col("pred_lang")),
        col("pred_lang"), SAMPLE_RATES.toMap, SAMPLE_DEFAULT)
        .orderBy(col("doc_id"))),

    // pair evidence → dedup DECISIONS: connected components over the d03
    // LSH pair graph; "keep one per cluster" is doc_id = cluster_id
    // (Dedup.dedupClusters doc)
    "d12_dedup_clusters" -> ((spark: SparkSession, dir: String) =>
      Dedup.dedupClusters(Tables.documents(spark, dir),
        Dedup.lshNearDupPairs(Tables.documents(spark, dir), K, BANDS, 0.5,
          MAX_BUCKET, MAX_DF))
        .orderBy(col("doc_id"))),

    // the SAME cluster contract as e05 computed by the OTHER algorithm:
    // large-star/small-star contraction (O(log²) rounds regardless of
    // graph diameter — the chain-shaped-evidence scale path;
    // Dedup.dedupClustersTwoStar doc). Oracle = e05's recursive-CTE
    // closure verbatim: both operators must produce identical clusters.
    "d22_cc_twostar" -> ((spark: SparkSession, dir: String) => {
      val emb = Tables.embeddings(spark, dir)
      val pairs = Similarity.nearDupPairs(emb, 0.4, ANN_BITS)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
      Dedup.dedupClustersTwoStar(emb.select(col("vec_id").as("doc_id")), pairs)
        .select(col("doc_id").as("vec_id"), col("cluster_id"), col("cluster_size"))
        .orderBy(col("vec_id"))
    }),

    // context-window chunking: doc → overlapping fixed-token windows,
    // digest-verified end-to-end (Curation.chunkPlan doc)
    "d23_chunk_plan" -> ((spark: SparkSession, dir: String) =>
      Curation.chunkPlan(Tables.documents(spark, dir), CHUNK_TOKENS, CHUNK_STRIDE)
        .orderBy(col("doc_id"), col("chunk_idx"))),

    // content-defined chunking: boundaries decided by token hashes, so
    // edits stay local and digests are reusable across corpus versions
    // (Curation.cdcChunks doc)
    "d25_cdc_chunks" -> ((spark: SparkSession, dir: String) =>
      Curation.cdcChunks(Tables.documents(spark, dir), CDC_MODULUS)
        .orderBy(col("doc_id"), col("chunk_idx"))),

    // lexical diversity: type-token ratio + Simpson concentration of
    // the unigram distribution (TextAnalysis.lexicalDiversity doc)
    "d26_diversity" -> ((spark: SparkSession, dir: String) =>
      TextAnalysis.lexicalDiversity(Tables.documents(spark, dir))
        .orderBy(col("doc_id"))),

    // mixture targets → per-stratum keep rates under a token budget
    // (Curation.mixSchedule doc); composes d21's stats with d16's
    // sampling mechanism
    "d24_mix_schedule" -> ((spark: SparkSession, dir: String) =>
      Curation.mixSchedule(
        Curation.mixtureStats(
          TextAnalysis.langId(Tables.documents(spark, dir)), col("pred_lang")),
        MIX_TARGETS, MIX_BUDGET_FRAC)
        .orderBy(col("stratum"))),

    // k-NN graph over the whole corpus: bucketed self-join, no broadcast
    // side (Similarity.knnGraph doc)
    "e06_knn_graph" -> ((spark: SparkSession, dir: String) =>
      Similarity.knnGraph(Tables.embeddings(spark, dir), KNN_K, ANN_BITS)
        .orderBy(col("vec_id"), col("rk"))),

    // the IVF TRAINING step: one Lloyd update over the seed centroids,
    // shared assignment code with e04, sequential-fold means so the
    // oracle hashes bit-for-bit (Similarity.kmeansUpdate doc)
    "e07_kmeans_update" -> ((spark: SparkSession, dir: String) =>
      Similarity.kmeansUpdate(Tables.embeddings(spark, dir), IVF_CELLS)
        .orderBy(col("cell"), col("dim"))),

    // the full Lloyd LOOP at 2 passes: pass-1 means feed back as
    // literal centroids (Similarity.kmeansIterate doc); the oracle
    // chains two copies of e07's update CTEs
    "e08_kmeans_iter" -> ((spark: SparkSession, dir: String) =>
      Similarity.kmeansIterate(Tables.embeddings(spark, dir), IVF_CELLS, KMEANS_ITERS)
        .orderBy(col("cell"), col("dim"))),

    // PQ index BUILD: every vector → 8 sub-codebook codes, pure
    // scan-side literal-codebook assignment (Similarity.pqEncode doc)
    "e09_pq_codes" -> ((spark: SparkSession, dir: String) =>
      Similarity.pqEncode(Tables.embeddings(spark, dir), PQ_M, PQ_KS)
        .orderBy(col("vec_id"), col("sub"))),

    // PQ index USE: asymmetric-distance top-k — exact query sub-vectors
    // vs quantized corpus codes, corpus side reads only the m-int codes
    // (Similarity.pqAdcTopK doc)
    "e10_pq_adc" -> ((spark: SparkSession, dir: String) =>
      Similarity.pqAdcTopK(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, PQ_K, PQ_M, PQ_KS)
        .orderBy(col("query_id"), col("rk"))),

    // PQ sub-codebook TRAINING: one Lloyd pass per subspace, DECIMAL
    // means (Similarity.pqTrain doc)
    "e11_pq_train" -> ((spark: SparkSession, dir: String) =>
      Similarity.pqTrain(Tables.embeddings(spark, dir), PQ_M, PQ_KS)
        .orderBy(col("sub"), col("code"), col("dim"))),

    // re-encode with the TRAINED books (seed fallback for empty cells)
    // — training and use of the index in one verified loop
    // (Similarity.pqEncodeTrained doc)
    "e12_pq_trained_codes" -> ((spark: SparkSession, dir: String) =>
      Similarity.pqEncodeTrained(Tables.embeddings(spark, dir), PQ_M, PQ_KS)
        .orderBy(col("vec_id"), col("sub"))),

    // the trained index's USE step: ADC top-k against e11's books —
    // train → encode → score, one verified lifecycle
    // (Similarity.pqAdcTopKTrained doc)
    "e13_pq_adc_trained" -> ((spark: SparkSession, dir: String) =>
      Similarity.pqAdcTopKTrained(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, PQ_K, PQ_M, PQ_KS)
        .orderBy(col("query_id"), col("rk"))),

    // IVF-PQ: probe-restricted candidates scored by trained-codebook
    // ADC — the two index structures composed (Similarity.ivfPqTopK doc)
    "e14_ivfpq_topk" -> ((spark: SparkSession, dir: String) =>
      Similarity.ivfPqTopK(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, PQ_K, IVF_CELLS, IVF_PROBES, PQ_M, PQ_KS)
        .orderBy(col("query_id"), col("rk"))),

    // the flagship index made durable: train+encode+persist once,
    // reload the book as a driver object and serve — registered
    // against e14's oracle verbatim (the round-trip equality IS the
    // claim) (Similarity.saveIvfPqIndex / ivfPqTopKIndexed docs)
    "e32_ivfpq_indexed" -> ((spark: SparkSession, dir: String) => {
      val emb = Tables.embeddings(spark, dir)
      val path = indexPath("e32-ivfpq")
      Similarity.saveIvfPqIndex(emb, path, IVF_CELLS, PQ_M, PQ_KS)
      Similarity.ivfPqTopKIndexed(emb, col("vec_id") % 50 === 0,
        path, PQ_K, IVF_PROBES)
        .orderBy(col("query_id"), col("rk"))
    }),

    // recall@k of the composed index vs the exact baseline — index
    // quality as a registered, oracle-checked metric
    // (Similarity.annRecall doc)
    "e15_ann_recall" -> ((spark: SparkSession, dir: String) =>
      Similarity.annRecall(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, PQ_K, IVF_CELLS, IVF_PROBES, PQ_M, PQ_KS)
        .orderBy(col("query_id"))),

    // e15 with the metric skew removed: the SAME measurement over the
    // unit-normalized corpus, where ADC-L2 and cosine rank identically
    // — recall now reads as pure index quality. Measured finding: this
    // corpus is ALREADY unit-norm, so e16 ties e15 here and the e15
    // deficit is index quality, not metric skew (Similarity.annRecall
    // doc; the Round8 spec shows the strict win on scale-skewed data)
    "e16_ann_recall_norm" -> ((spark: SparkSession, dir: String) =>
      Similarity.annRecall(
        Similarity.unitNormalized(Tables.embeddings(spark, dir)),
        col("vec_id") % 50 === 0, PQ_K, IVF_CELLS, IVF_PROBES, PQ_M, PQ_KS)
        .orderBy(col("query_id"))),

    // recall@k of the LSH multi-probe family vs the same exact baseline
    // — the sign-projection twin of e15, one shared recall definition
    // across both index families (Similarity.annRecallLsh doc)
    "e17_ann_recall_lsh" -> ((spark: SparkSession, dir: String) =>
      Similarity.annRecallLsh(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, PQ_K, ANN_BITS)
        .orderBy(col("query_id"))),

    // iterated PQ training: pass-1 means become the pass-2 assignment
    // book (keep-old-centroid per pass) — the train loop whose payoff
    // e15/e16 measure (Similarity.pqTrainIterated doc)
    "e11b_pq_train_iter" -> ((spark: SparkSession, dir: String) =>
      Similarity.pqTrainIterated(Tables.embeddings(spark, dir), PQ_M, PQ_KS,
        PQ_PASSES)
        .orderBy(col("sub"), col("code"), col("dim"))),

    // IVF alternative to the LSH family: literal-centroid assignment
    // scan-side, probe the 4 nearest of 16 cells (Similarity.ivfTopK doc)
    "e04_ivf_ann" -> ((spark: SparkSession, dir: String) =>
      Similarity.ivfTopK(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, 3, IVF_CELLS, IVF_PROBES)
        .orderBy(col("query_id"), col("rk"))),

    // prototypicality: each vector's cosine to its nearest IVF centroid
    // — the semantic-outlier curation signal, scan-side and join-free,
    // same assignment device as the index (Similarity.centroidAffinity)
    "e18_centroid_affinity" -> ((spark: SparkSession, dir: String) =>
      Similarity.centroidAffinity(Tables.embeddings(spark, dir), IVF_CELLS)
        .orderBy(col("vec_id"))),

    // IVF balance diagnostic: member count + corpus share per cell —
    // probe cost at scale IS the probed cells' mass
    // (Similarity.cellOccupancy doc)
    "e19_cell_occupancy" -> ((spark: SparkSession, dir: String) =>
      Similarity.cellOccupancy(Tables.embeddings(spark, dir), IVF_CELLS)
        .orderBy(col("cell"))),

    // two-stage retrieval: IVF-PQ shortlist (4×k deep), raw vectors
    // fetched for ONLY the shortlist, final top-k by exact cosine — the
    // serving shape of production ANN (Similarity.ivfPqRerankTopK doc)
    "e20_rerank_topk" -> ((spark: SparkSession, dir: String) =>
      Similarity.ivfPqRerankTopK(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, PQ_K, RERANK_SHORTLIST,
        IVF_CELLS, IVF_PROBES, PQ_M, PQ_KS)
        .orderBy(col("query_id"), col("rk"))),

    // what re-ranking buys, as a registered metric: e15's recall device
    // over the two-stage path — ≥ e15 pointwise by construction
    // (Similarity.annRecallReranked doc)
    "e21_rerank_recall" -> ((spark: SparkSession, dir: String) =>
      Similarity.annRecallReranked(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, PQ_K, RERANK_SHORTLIST,
        IVF_CELLS, IVF_PROBES, PQ_M, PQ_KS)
        .orderBy(col("query_id"))),

    // residual IVF-PQ (the FAISS-style construction): PQ over
    // x − centroid(cell), residual-sample seeds, probed-cell query
    // residuals — estimator strictly tighter, ranking honestly worse
    // on this structureless corpus (Similarity.ivfPqResidualTopK doc)
    "e22_ivfpq_residual" -> ((spark: SparkSession, dir: String) =>
      Similarity.ivfPqResidualTopK(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, PQ_K, IVF_CELLS, IVF_PROBES, PQ_M, PQ_KS)
        .orderBy(col("query_id"), col("rk"))),

    // the residual construction's payoff/deficit as a registered
    // number — the decision device for whether a corpus's cluster
    // structure earns residual encoding (Similarity.annRecallResidual)
    "e23_residual_recall" -> ((spark: SparkSession, dir: String) =>
      Similarity.annRecallResidual(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, PQ_K, IVF_CELLS, IVF_PROBES, PQ_M, PQ_KS)
        .orderBy(col("query_id"))),

    // scalar quantization (SQ8): per-dimension byte codes on corpus
    // [min, max] ranges — 4× compression, the middle rung of the
    // ladder (Similarity.sq8TopK doc)
    "e24_sq8_topk" -> ((spark: SparkSession, dir: String) =>
      Similarity.sq8TopK(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, PQ_K)
        .orderBy(col("query_id"), col("rk"))),

    // the ladder measured: SQ8 recall beside e15/e21/e23, one shared
    // definition (Similarity.annRecallSq8 doc)
    "e25_sq8_recall" -> ((spark: SparkSession, dir: String) =>
      Similarity.annRecallSq8(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, PQ_K)
        .orderBy(col("query_id"))),

    // the dimension-reduction rung: Achlioptas ±1 JL projection
    // (64→16, derandomized via md5 so both engines inline the same
    // matrix), ranked by reduced-space squared L2
    // (Similarity.srpTopK doc)
    "e35_srp_topk" -> ((spark: SparkSession, dir: String) =>
      Similarity.srpTopK(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, PQ_K, SRP_DIMS)
        .orderBy(col("query_id"), col("rk"))),

    // the dimension axis measured by the shared recall device — with
    // e25 (precision axis) and e27 (coverage axis) this completes the
    // three-way factoring of ANN loss (Similarity.annRecallSrp doc)
    "e36_srp_recall" -> ((spark: SparkSession, dir: String) =>
      Similarity.annRecallSrp(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, PQ_K, SRP_DIMS)
        .orderBy(col("query_id"))),

    // SRP shortlist + the ONE shared exact re-rank tail
    // (Similarity.srpRerankTopK doc)
    "e37_srp_rerank" -> ((spark: SparkSession, dir: String) =>
      Similarity.srpRerankTopK(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, PQ_K, RERANK_SHORTLIST, SRP_DIMS)
        .orderBy(col("query_id"), col("rk"))),

    // ≥ e36 pointwise (spec-pinned dominance); the pair reads the
    // shortlist-recoverable share of the dimension axis' loss
    "e38_srp_rerank_recall" -> ((spark: SparkSession, dir: String) =>
      Similarity.annRecallSrpReranked(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, PQ_K, RERANK_SHORTLIST, SRP_DIMS)
        .orderBy(col("query_id"))),

    // the SRP rung as an INDEX (e39): sign-bit signature split into
    // Hamming blocks (the d30 multi-index device), candidates from the
    // block equi-join against broadcast query blocks — probe-bounded,
    // never e35's flat nested-loop scan (plan pinned in Round10OpsSpec)
    // (Similarity.srpBucketTopK doc)
    "e39_srp_bucket_topk" -> ((spark: SparkSession, dir: String) =>
      Similarity.srpBucketTopK(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, PQ_K, SRP_DIMS, SRP_RADIUS)
        .orderBy(col("query_id"), col("rk"))),

    // e39 measured by the shared recall device; read beside e36 — the
    // delta is pure bucket-coverage loss on the dimension axis
    // (Similarity.annRecallSrpBucket doc)
    "e40_srp_bucket_recall" -> ((spark: SparkSession, dir: String) =>
      Similarity.annRecallSrpBucket(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, PQ_K, SRP_DIMS, SRP_RADIUS)
        .orderBy(col("query_id"))),

    // e39 made durable (e41): the block table persisted PARTITIONED BY
    // (bpos, bval) under the manifest device, queries served from the
    // store with probed blocks pruned at the file-index layer —
    // registered against e39's oracle VERBATIM, so the round trip
    // through disk is proven bit-identical (Similarity.saveSrpIndex /
    // srpBucketTopKIndexed docs; pruning PlanShape-pinned in
    // Round10OpsSpec)
    "e41_srp_indexed" -> ((spark: SparkSession, dir: String) => {
      val emb = Tables.embeddings(spark, dir)
      val path = indexPath("e41-srp")
      Similarity.saveSrpIndex(emb, path, SRP_DIMS, SRP_RADIUS)
      Similarity.srpBucketTopKIndexed(emb, col("vec_id") % 50 === 0,
        path, PQ_K, pruneScan = true)
        .orderBy(col("query_id"), col("rk"))
    }),

    // the increment half (e42): index built on the 3/4-cut history,
    // the rest appended. STRONGER than e33's frozen-book claim: the
    // SRP "codebook" is parameter-derived (nothing trained), so the
    // appended index is bit-identical to a fresh build on the grown
    // corpus — same e39 oracle verbatim, history files untouched
    // (Similarity.appendSrpIndex doc)
    "e42_srp_appended" -> ((spark: SparkSession, dir: String) => {
      val emb = Tables.embeddings(spark, dir)
      val cut = emb.agg(max(col("vec_id"))).head().getLong(0) * 3 / 4
      val path = indexPath("e42-srp")
      Similarity.saveSrpIndex(emb.filter(col("vec_id") <= cut), path,
        SRP_DIMS, SRP_RADIUS)
      Similarity.appendSrpIndex(emb.filter(col("vec_id") > cut), path)
      Similarity.srpBucketTopKIndexed(emb, col("vec_id") % 50 === 0,
        path, PQ_K, pruneScan = true)
        .orderBy(col("query_id"), col("rk"))
    }),

    // TIME-TRAVEL serve of the SRP index (e74): build = snapshot v1,
    // append = v2; querying AT v1 is the same pruned block probe plus
    // one pushed vec_id cut (a version IS its watermark on the
    // id-monotone block table — the d153 device applied to an ANN
    // index); oracle = the e39 chain with the candidate side cut to
    // the history watermark (Similarity.srpBucketTopKIndexed asOf doc)
    "e74_srp_time_travel" -> ((spark: SparkSession, dir: String) => {
      val emb = Tables.embeddings(spark, dir)
      val cut = emb.agg(max(col("vec_id"))).head().getLong(0) * 3 / 4
      val path = indexPath("e74-srp")
      Similarity.saveSrpIndex(emb.filter(col("vec_id") <= cut), path,
        SRP_DIMS, SRP_RADIUS)
      Similarity.appendSrpIndex(emb.filter(col("vec_id") > cut), path)
      Similarity.srpBucketTopKIndexed(emb, col("vec_id") % 50 === 0,
        path, PQ_K, pruneScan = true, asOfVersion = Some(1))
        .orderBy(col("query_id"), col("rk"))
    }),

    // the maintenance policy for the SRP family (e43), the e34 shape:
    // built on the history cut, synced twice against the grown corpus
    // (append, then the fresh no-op), served — same e39 oracle
    // verbatim; action strings pinned in Round10OpsSpec
    // (Similarity.srpIndexSync doc)
    "e43_srp_sync" -> ((spark: SparkSession, dir: String) => {
      val emb = Tables.embeddings(spark, dir)
      val cut = emb.agg(max(col("vec_id"))).head().getLong(0) * 3 / 4
      val path = indexPath("e43-srp")
      Similarity.saveSrpIndex(emb.filter(col("vec_id") <= cut), path,
        SRP_DIMS, SRP_RADIUS)
      Similarity.srpIndexSync(emb, path, SRP_DIMS, SRP_RADIUS)
      Similarity.srpIndexSync(emb, path, SRP_DIMS, SRP_RADIUS)
      Similarity.srpBucketTopKIndexed(emb, col("vec_id") % 50 === 0,
        path, PQ_K, pruneScan = true)
        .orderBy(col("query_id"), col("rk"))
    }),

    // IVF + SQ8 (FAISS IVFSQ): probe-bounded candidates, byte-code
    // scoring — the production middle ground; the flat e24 is the
    // measurement baseline, this is the scale path
    // (Similarity.ivfSq8TopK doc)
    "e26_ivf_sq8_topk" -> ((spark: SparkSession, dir: String) =>
      Similarity.ivfSq8TopK(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, PQ_K, IVF_CELLS, IVF_PROBES)
        .orderBy(col("query_id"), col("rk"))),

    // the build-once/query-many round trip: persist the index (codes +
    // cents + quant as parquet), then serve the SAME queries from it —
    // registered to PROVE the persisted path is bit-identical to e26's
    // in-memory chain (they share one oracle); the timed row measures
    // build+persist+load+query end to end. The registered form is the
    // PRODUCTION form: cell-partitioned layout + pruneScan, so the
    // oracle-checked plan is the one whose scan prunes unprobed cells
    // at the file-index layer (PlanShapeSpec asserts PartitionFilters)
    // (Similarity.saveIvfSq8Index / ivfSq8TopKIndexed docs)
    "e31_ivf_sq8_indexed" -> ((spark: SparkSession, dir: String) => {
      val emb = Tables.embeddings(spark, dir)
      val path = indexPath("e31-ivfsq8")
      Similarity.saveIvfSq8Index(emb, path, IVF_CELLS, partitionByCell = true)
      Similarity.ivfSq8TopKIndexed(emb, col("vec_id") % 50 === 0,
        path, PQ_K, IVF_PROBES, pruneScan = true)
        .orderBy(col("query_id"), col("rk"))
    }),

    // the INCREMENT half of build-once/query-many (e33): index built
    // on the 3/4-cut history, the rest appended with the FROZEN
    // codebook (centroids + quantizer reloaded from the index, never
    // re-derived), the full corpus served from the appended index —
    // checked against a from-scratch rebuild that trains its quantizer
    // on history only, so the green row PROVES frozen-book appends are
    // bit-identical to a full re-encode while the history codes were
    // never touched (Round9OpsSpec pins the file-level no-recompute)
    // (Similarity.appendIvfSq8Index doc). The max(vec_id) cut is one
    // driver scalar off a count/max agg — watermark-scale, not data.
    "e33_ivf_sq8_appended" -> ((spark: SparkSession, dir: String) => {
      val emb = Tables.embeddings(spark, dir)
      val cut = emb.agg(max(col("vec_id"))).head().getLong(0) * 3 / 4
      val path = indexPath("e33-ivfsq8")
      Similarity.saveIvfSq8Index(emb.filter(col("vec_id") <= cut), path,
        IVF_CELLS, partitionByCell = true)
      Similarity.appendIvfSq8Index(emb.filter(col("vec_id") > cut), path)
      Similarity.ivfSq8TopKIndexed(emb, col("vec_id") % 50 === 0,
        path, PQ_K, IVF_PROBES, pruneScan = true)
        .orderBy(col("query_id"), col("rk"))
    }),

    // TIME-TRAVEL serve of the IVF+SQ8 index (e75): build = snapshot
    // v1, append = v2; querying AT v1 adds one pushed vec_id cut
    // beside the cell pruning — valid because appends never retrain
    // the codebook (v1's book IS the live book), the e33 frozen-book
    // claim carried to snapshots; oracle = e33's frozen-book chain
    // with the candidate side cut to the history watermark
    // (Similarity.ivfSq8TopKIndexed asOf doc)
    "e75_ivf_time_travel" -> ((spark: SparkSession, dir: String) => {
      val emb = Tables.embeddings(spark, dir)
      val cut = emb.agg(max(col("vec_id"))).head().getLong(0) * 3 / 4
      val path = indexPath("e75-ivfsq8")
      Similarity.saveIvfSq8Index(emb.filter(col("vec_id") <= cut), path,
        IVF_CELLS, partitionByCell = true)
      Similarity.appendIvfSq8Index(emb.filter(col("vec_id") > cut), path)
      Similarity.ivfSq8TopKIndexed(emb, col("vec_id") % 50 === 0,
        path, PQ_K, IVF_PROBES, pruneScan = true, asOfVersion = Some(1))
        .orderBy(col("query_id"), col("rk"))
    }),

    // the maintenance POLICY as one operator (e34): an index built on
    // the history cut, then synced twice against the grown corpus —
    // the first sync detects monotone growth and appends the delta
    // with the frozen codebook, the second is the fresh no-op — and
    // served. Registered against the same frozen-book rebuild oracle
    // as e33: sync-to-append must be indistinguishable from a hand
    //-written append, and the no-op must not perturb it
    // (Similarity.ivfSq8IndexSync doc; action strings pinned in
    // Round9OpsSpec)
    "e34_ivf_sq8_sync" -> ((spark: SparkSession, dir: String) => {
      val emb = Tables.embeddings(spark, dir)
      val cut = emb.agg(max(col("vec_id"))).head().getLong(0) * 3 / 4
      val path = indexPath("e34-ivfsq8")
      Similarity.saveIvfSq8Index(emb.filter(col("vec_id") <= cut), path,
        IVF_CELLS, partitionByCell = true)
      Similarity.ivfSq8IndexSync(emb, path, IVF_CELLS, partitionByCell = true)
      Similarity.ivfSq8IndexSync(emb, path, IVF_CELLS, partitionByCell = true)
      Similarity.ivfSq8TopKIndexed(emb, col("vec_id") % 50 === 0,
        path, PQ_K, IVF_PROBES, pruneScan = true)
        .orderBy(col("query_id"), col("rk"))
    }),

    // the coverage-vs-quantization factoring: e25 isolates code
    // quality (0.986), this isolates the probe-coverage ceiling
    // (Similarity.annRecallIvfSq8 doc)
    "e27_ivf_sq8_recall" -> ((spark: SparkSession, dir: String) =>
      Similarity.annRecallIvfSq8(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, PQ_K, IVF_CELLS, IVF_PROBES)
        .orderBy(col("query_id"))),

    // IVF+SQ8 shortlist re-ranked by exact cosine: the SQ8 twin of e20,
    // closing the recoverable part of e27's gap to the coverage ceiling
    // (Similarity.ivfSq8RerankTopK doc)
    "e28_ivf_sq8_rerank" -> ((spark: SparkSession, dir: String) =>
      Similarity.ivfSq8RerankTopK(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, PQ_K, RERANK_SHORTLIST,
        IVF_CELLS, IVF_PROBES)
        .orderBy(col("query_id"), col("rk"))),

    // the (e27, e29, ceiling) triple: how much of the remaining loss is
    // recoverable by exact scorings vs structural unprobed mass
    // (Similarity.annRecallIvfSq8Reranked doc)
    "e29_ivf_sq8_rerank_recall" -> ((spark: SparkSession, dir: String) =>
      Similarity.annRecallIvfSq8Reranked(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, PQ_K, RERANK_SHORTLIST,
        IVF_CELLS, IVF_PROBES)
        .orderBy(col("query_id"))),

    // the tuning lever as a registered measurement: mean recall@k per
    // probe count, endpoint (= nCells) pinned to the flat-scan ceiling
    // (Similarity.ivfProbeCurve doc)
    "e30_ivf_probe_curve" -> ((spark: SparkSession, dir: String) =>
      Similarity.ivfProbeCurve(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, PQ_K, IVF_CELLS, PROBE_CURVE)
        .orderBy(col("probes"))),

    // the SRP coverage lever as a registered row set (e44): mean
    // recall per Hamming radius — candidate sets NEST as blocks split
    // in half, so the curve is nondecreasing by construction
    // (spec-pinned), unlike probabilistic banding
    // (Similarity.srpRadiusCurve doc)
    "e44_srp_radius_curve" -> ((spark: SparkSession, dir: String) =>
      Similarity.srpRadiusCurve(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, PQ_K, SRP_DIMS, SRP_RADII)
        .orderBy(col("radius"))),

    "m01_media_meta" -> ((spark: SparkSession, dir: String) =>
      Multimodal.mediaView(Tables.documents(spark, dir))
        .select(col("doc_id"),
          length(col("payload")).cast("long").as("n_bytes"),
          substring(hex(col("payload")), 1, 16).as("header_hex"),
          col("lang"), col("source"))
        .orderBy(col("doc_id"))),

    // The decode path itself (mapPartitions + StubCodec), oracle-covered:
    // width/height are pure integer arithmetic on the payload length, so
    // DuckDB can recompute them — a broken batching/typing layer around
    // the codec breaks the hash match.
    "m02_media_decode" -> ((spark: SparkSession, dir: String) =>
      Multimodal.decodeAll(spark,
          Multimodal.mediaView(Tables.documents(spark, dir)))
        .select(col("doc_id"), col("n_bytes"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"))
        .orderBy(col("doc_id")))
  )

  // ---- oracle SQL (DuckDB), built with the same loops as the Scala ----

  /** DuckDB mirror of [[graft.operators.Dedup.hash60]] — THE one SQL-side
    * copy of the 60-bit construction, shared across query families
    * ([[graft.queries.RelationalQueries]] uses it for the q11b KMV
    * oracle); keep in lockstep with the Scala helper (15 hex chars: 16
    * would overflow a signed BIGINT).
    */
  private[queries] def duckHash60(expr: String) =
    s"('0x' || substr(md5($expr), 1, 15))::BIGINT"

  /** Mirror of the IVF seed-centroid ASSIGNMENT
    * ([[graft.operators.Similarity]]'s `centroidScores`) as one CTE
    * chain ending in `cells(vid, cell)` (plus `asg` with the full
    * per-centroid ranking for probe selection) — shared by e04 and e07
    * so index use and index training check against one assignment.
    */
  private val vHeadRaw =
    "v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)"

  /** Mirror of [[graft.operators.Similarity.srpTopK]] (consumes `v`) —
    * ends in `srp(query_id, neighbor_id, rp_dist)`. The ±1 matrix comes
    * from the SAME [[graft.operators.Similarity.srpSignMatrix]] call
    * the Spark side inlines; projection and distance are generated as
    * strictly left-to-right chains matching the Spark fold's
    * association, so every double agrees to the bit.
    */
  private lazy val srpProjCte = {
    val signs = Similarity.srpSignMatrix(SRP_DIMS, PQ_DIMS)
    val projs = signs.map { row =>
      "CAST(0.0 AS DOUBLE) " + row.zipWithIndex.map { case (s, i) =>
        (if (s > 0) "+ " else "- ") + s"e[${i + 1}]"
      }.mkString(" ")
    }
    s"sp AS (SELECT vec_id, [${projs.mkString(", ")}] AS p FROM v)"
  }

  /** The reduced-space squared-L2 chain between aliases q and c — the
    * same left-to-right association as the Spark fold.
    */
  private def srpDistChain = "CAST(0.0 AS DOUBLE) " + (1 to SRP_DIMS).map(k =>
    s"+ (q.p[$k] - c.p[$k]) * (q.p[$k] - c.p[$k])").mkString(" ")

  private lazy val srpCtes =
    s"""$srpProjCte,
       |srp AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |  $srpDistChain AS rp_dist
       |  FROM sp q JOIN sp c ON q.vec_id % 50 = 0 AND c.vec_id <> q.vec_id)""".stripMargin
      .replace("\n", " ")

  /** Mirror of [[graft.operators.Similarity.srpBucketTopK]]'s candidate
    * scoring (consumes `sp`) — ends in `sbk(query_id, neighbor_id,
    * rp_dist)`. The share-a-block predicate is the OR over per-block
    * equalities — set-equal to the Spark side's exploded equi-join +
    * dedup (a pair matching m blocks appears once here, m identical
    * times there before its min() dedup).
    */
  private def srpBucketCtesAt(radius: Int, candFilter: String = "") = {
    val bs = SRP_DIMS / (radius + 1)
    val mask = (1L << bs) - 1
    val sigExpr = (1 to SRP_DIMS).map(k =>
      s"(CASE WHEN p[$k] >= 0 THEN ${1L << (k - 1)} ELSE 0 END)").mkString(" + ")
    val blockOr = (0 to radius).map(j =>
      s"((c.sig >> ${j * bs}) & $mask) = ((q.sig >> ${j * bs}) & $mask)").mkString(" OR ")
    s"""sg AS (SELECT vec_id, p, CAST($sigExpr AS BIGINT) AS sig FROM sp),
       |sbk AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |  $srpDistChain AS rp_dist
       |  FROM sg c JOIN sg q ON q.vec_id % 50 = 0 AND c.vec_id <> q.vec_id
       |    $candFilter AND ($blockOr))""".stripMargin.replace("\n", " ")
  }

  private lazy val srpBucketCtes = srpBucketCtesAt(SRP_RADIUS)

  /** One branch of the e44 radius curve (the [[probeCurveBranch]] shape
    * over the SRP bucket chain at `radius`).
    */
  private def srpRadiusBranch(radius: Int) =
    s"""SELECT CAST($radius AS BIGINT) AS radius, n_queries, n_hits,
       |  CAST(n_hits AS DOUBLE) / (n_queries * $PQ_K) AS mean_recall FROM (
       |WITH $vHeadRaw,
       |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
       |$srpProjCte,
       |${srpBucketCtesAt(radius)},
       |ap3 AS (SELECT query_id, neighbor_id FROM
       |  (SELECT *, row_number() OVER (PARTITION BY query_id
       |     ORDER BY rp_dist ASC, neighbor_id ASC) AS rk FROM sbk) WHERE rk <= $PQ_K),
       |pex AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |        list_dot_product(q.e, c.e)/(q.nrm*c.nrm) AS cosine
       |        FROM n q JOIN n c ON q.vec_id % 50 = 0 AND c.vec_id <> q.vec_id),
       |ex3 AS (SELECT query_id, neighbor_id FROM
       |  (SELECT *, row_number() OVER (PARTITION BY query_id
       |     ORDER BY cosine DESC, neighbor_id ASC) AS rk FROM pex) WHERE rk <= $PQ_K),
       |hits AS (SELECT e.query_id, count(*) AS n_hit
       |         FROM ex3 e JOIN ap3 a USING (query_id, neighbor_id) GROUP BY 1),
       |pq AS (SELECT q.query_id, coalesce(n_hit, 0) AS n_hit
       |       FROM (SELECT DISTINCT query_id FROM ex3) q LEFT JOIN hits USING (query_id))
       |SELECT CAST(count(*) AS BIGINT) AS n_queries,
       |  CAST(coalesce(sum(n_hit), 0) AS BIGINT) AS n_hits FROM pq)""".stripMargin.replace("\n", " ")

  /** The `v` head over the UNIT-NORMALIZED corpus (mirror of
    * [[graft.operators.Similarity.unitNormalized]]): each component
    * divided by the vector's own L2 norm — same `list_dot_product`
    * fold, same double division, so the normalized components are
    * bit-identical cross-engine. Everything downstream of `v` stacks
    * unchanged, which is the point: e16 IS e15 with this head.
    */
  private val vHeadUnit =
    """v0 AS (SELECT vec_id, embedding::DOUBLE[] AS e0,
      |       sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nr
      |       FROM embeddings),
      |v AS (SELECT vec_id, list_transform(e0, x -> x / nr) AS e FROM v0)""".stripMargin.replace("\n", " ")

  private lazy val ivfAsgAfterV =
    s"""n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
       |cent AS (SELECT vec_id AS cid, e AS ce, sqrt(list_dot_product(e, e)) AS cn FROM v WHERE vec_id < $IVF_CELLS),
       |${centroidAsgCtes("", "cent")}""".stripMargin

  private lazy val ivfAsgCtes = s"$vHeadRaw,\n$ivfAsgAfterV"

  /** Nearest-centroid assignment against centroid CTE `centCte`
    * (cid, ce, cn) — ends in `cells$suffix(vid, cell)`. The tie-break
    * (cosine DESC, cid ASC) mirrors the Scala struct ordering.
    */
  private def centroidAsgCtes(suffix: String, centCte: String) =
    s"""asg$suffix AS (SELECT n.vec_id AS vid, cid,
       |          list_dot_product(n.e, ce)/(n.nrm*cn) AS cos,
       |          row_number() OVER (PARTITION BY n.vec_id
       |            ORDER BY list_dot_product(n.e, ce)/(n.nrm*cn) DESC, cid ASC) AS rn
       |        FROM n CROSS JOIN $centCte),
       |cells$suffix AS (SELECT vid, cid AS cell FROM asg$suffix WHERE rn = 1)""".stripMargin

  /** Per-cell per-dimension means of `cellsCte`'s members — the SAME
    * order-independent exact aggregate as Spark's
    * (`Similarity.updateFor`): each component cast once to
    * DECIMAL(28,8) (the two engines' double→decimal roundings agree at
    * scale 8 on the whole corpus — Similarity.meanDec doc), summed
    * exactly per (cell, dim), divided by the member count in one double
    * op. Ends in `m$suffix(cell, nm, dim, val)`.
    */
  private def kmeansMeanCtes(suffix: String, cellsCte: String) =
    s"""x$suffix AS (SELECT cl.cell, unnest(range(1, len(n.e) + 1)) AS dim,
       |        CAST(unnest(n.e) AS DECIMAL(28,8)) AS x
       |        FROM $cellsCte cl JOIN n ON n.vec_id = cl.vid),
       |m$suffix AS (SELECT cell, dim, count(*) AS nm,
       | CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS val
       | FROM x$suffix GROUP BY cell, dim)""".stripMargin

  /** Final projection shared by the k-means oracles. */
  private def kmeansSelect(meanCte: String) =
    s"""SELECT cell, CAST(nm AS BIGINT) AS n_members, CAST(dim AS BIGINT) AS dim, val
       |FROM $meanCte ORDER BY cell, dim""".stripMargin

  /** THE d27 estimation pipeline (mirror of
    * [[graft.operators.Dedup.minhashEstPairs]]) as one CTE chain ending
    * in `est(a, b, est_jaccard)` — the k=64 signature build (same
    * universal-hash constants via [[minhashSelectK]]), 16 4-row bands,
    * bucket cap, then agreement-count/64 per candidate; no shingle
    * intersection anywhere past the signature build. Shared by d27 and
    * d29 so the signature family cannot desynchronize between them.
    */
  /** The d27 estimation chain over an optionally-sliced corpus (the
    * `docFilter` rides [[shingleCteOver]]) — ends in
    * `est(a, b, est_jaccard)`. d52 runs it on the d04 slice beside the
    * exact chain; the shared val below is the full-corpus instance.
    */
  private def minhashEstCtesOver(docFilter: String) = {
    val rows = EST_K / EST_BANDS
    val bandSel = (0 until EST_BANDS).map { b =>
      val parts = (0 until rows).map(r => s"CAST(mh${b * rows + r} AS VARCHAR)")
      s"md5(${parts.mkString(" || '|' || ")}) AS band$b"
    }.mkString(", ")
    val bandUni = (0 until EST_BANDS)
      .map(b => s"SELECT doc_id, $b AS bno, band$b AS bkey FROM sig64")
      .mkString(" UNION ALL ")
    val agree = (0 until EST_K)
      .map(i => s"CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""${shingleCteOver(docFilter)},
       |mins64 AS (SELECT doc_id, ${minhashSelectK(EST_K)} FROM shh GROUP BY doc_id),
       |sig64 AS (SELECT doc_id, $bandSel FROM mins64),
       |bl64 AS ($bandUni),
       |blb64 AS (SELECT bl64.* FROM bl64 JOIN (SELECT bno, bkey FROM bl64
       |          GROUP BY bno, bkey HAVING count(*) <= $MAX_BUCKET) h USING (bno, bkey)),
       |cand64 AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM blb64 x
       |           JOIN blb64 y ON x.bno = y.bno AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
       |est AS (SELECT c.a, c.b, CAST(($agree) AS DOUBLE) / $EST_K AS est_jaccard
       |        FROM cand64 c JOIN mins64 sa ON sa.doc_id = c.a
       |        JOIN mins64 sb ON sb.doc_id = c.b)""".stripMargin.replace("\n", " ")
  }

  private lazy val minhashEstCtes = minhashEstCtesOver("")

  /** Mirror of the d77 indexed-probe chain (shared verbatim by d78's
    * append≡rebuild and d79's sync round trip): full-corpus k=64
    * signatures (per-doc pure, so slicing after the build equals the
    * Scala side's per-slice builds), history band rows capped at probe
    * time, increment×history candidate join, signature-agreement
    * estimate, best match with lowest-id tie, threshold verdict.
    */
  private lazy val lshIndexedSql: String = lshIndexedSqlFor("doc_id % 4 <> 0")

  /** The d77 probe chain with a parameterized index-side membership
    * filter — d77/d78/d79 pass the plain history predicate; d157 cuts
    * it at snapshot v1's watermark (the as-of read's doc_id cut).
    */
  private def lshIndexedSqlFor(histWhere: String): String = {
    val rows = EST_K / EST_BANDS
    val bandSel = (0 until EST_BANDS).map { b =>
      val parts = (0 until rows).map(r => s"CAST(mh${b * rows + r} AS VARCHAR)")
      s"md5(${parts.mkString(" || '|' || ")}) AS band$b"
    }.mkString(", ")
    val bandUni = (0 until EST_BANDS)
      .map(b => s"SELECT doc_id, $b AS bno, band$b AS bkey FROM lsig")
      .mkString(" UNION ALL ")
    val agree = (0 until EST_K)
      .map(i => s"CASE WHEN si.mh$i = sh2.mh$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH $shingleCte,
       |lmins AS (SELECT doc_id, ${minhashSelectK(EST_K)} FROM shh GROUP BY doc_id),
       |lsig AS (SELECT doc_id, $bandSel FROM lmins),
       |lbl AS ($bandUni),
       |hbl AS (SELECT * FROM lbl WHERE $histWhere),
       |hb AS (SELECT hbl.* FROM hbl JOIN (SELECT bno, bkey FROM hbl
       |       GROUP BY bno, bkey HAVING count(*) <= $MAX_BUCKET) g USING (bno, bkey)),
       |ibl AS (SELECT * FROM lbl WHERE doc_id % 4 = 0),
       |lcand AS (SELECT DISTINCT i.doc_id AS nid, h.doc_id AS hid
       |          FROM ibl i JOIN hb h ON i.bno = h.bno AND i.bkey = h.bkey),
       |lest AS (SELECT nid, hid, CAST(($agree) AS DOUBLE) / $EST_K AS ej
       |         FROM lcand JOIN lmins si ON si.doc_id = nid
       |         JOIN lmins sh2 ON sh2.doc_id = hid),
       |lbest AS (SELECT nid, count(*) AS n_cand, max(ej) AS best_est FROM lest GROUP BY nid),
       |ldof AS (SELECT e.nid, min(e.hid) AS dup_of FROM lest e
       |         JOIN lbest b ON b.nid = e.nid AND e.ej = b.best_est GROUP BY e.nid),
       |lbase AS (SELECT doc_id FROM documents WHERE doc_id % 4 = 0 AND len(string_split(text,' ')) >= 3)
       |SELECT lbase.doc_id, coalesce(n_cand, 0) AS n_cand, dup_of, best_est,
       |  coalesce(best_est >= 0.5, false) AS is_dup
       |FROM lbase LEFT JOIN lbest ON lbest.nid = lbase.doc_id
       |LEFT JOIN ldof ON ldof.nid = lbase.doc_id
       |ORDER BY lbase.doc_id""".stripMargin.replace("\n", " ")
  }

  // ---- PQ (e09/e10) oracle fragments ----
  // Distance chains are generated per dimension with explicit
  // parenthesization so the left-associative `+` order is IDENTICAL to
  // the Scala reduce chains (Similarity.l2sqLit doc) — association
  // order is the cross-engine float-determinism contract.

  /** `((a[o+1]-b[o+1])*(a[o+1]-b[o+1])) + …` over one subspace. */
  private def pqL2Chain(a: String, b: String, sub: Int) = {
    val subDim = PQ_DIMS / PQ_M
    (0 until subDim).map { j =>
      val i = sub * subDim + j + 1
      s"(($a[$i] - $b[$i]) * ($a[$i] - $b[$i]))"
    }.mkString(" + ")
  }

  /** The PQ assignment chain over source CTE `src(vec_id, e)` (so it can
    * stack on any head — e14 stacks it on the IVF chain's `v`, e22 on
    * the residual view `rv`). Seeds are the `PQ_KS` vec_ids from
    * `offset` (mirror of the Scala [[graft.operators.Similarity]]
    * pqSeeds offset — the residual book must seed from residual
    * SAMPLES, so e22 passes offset = IVF_CELLS). Ends in
    * `pcodes(vid, sub 1-based, code)`.
    */
  private def pqCodesAfterVFrom(src: String, offset: Int) =
    s"""pcent AS (SELECT vec_id - $offset AS cid, e AS ce FROM $src
       |  WHERE vec_id >= $offset AND vec_id < ${offset + PQ_KS}),
       |pasg AS (${(0 until PQ_M).map(s =>
           s"SELECT $src.vec_id AS vid, c.cid, ${s + 1} AS sub, ${pqL2Chain(s"$src.e", "c.ce", s)} AS d" +
           s" FROM $src CROSS JOIN pcent c").mkString(" UNION ALL ")}),
       |pcodes AS (SELECT vid, sub, cid AS code FROM
       |  (SELECT *, row_number() OVER (PARTITION BY vid, sub ORDER BY d ASC, cid ASC) AS rn FROM pasg)
       |  WHERE rn = 1)""".stripMargin.replace("\n", " ")

  private lazy val pqCodesAfterV = pqCodesAfterVFrom("v", 0)

  /** CTE chain ending in `pcodes(vid, sub 1-based, code)` — the PQ
    * assignment (mirror of Similarity.pqCodesWide): per subspace, the
    * nearest seed slice by squared L2, ties toward the smaller cid.
    */
  private def pqCodesCtes =
    s"""v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |$pqCodesAfterV""".stripMargin.replace("\n", " ")

  /** The trained-grid + trained-codes tail (consumes `pcodes`/`v`/
    * `pcent` + [[pqTrainCtes]]'s `mt`): trained-or-seed centroid grid,
    * re-assignment, wide code pivot — ends in `grid(sub, code, ce)` and
    * `pcw2(vid, c1..cm)`. Shared by e12's SELECT, e13 and e14.
    */
  private def pqTrainedGridCtesFrom(src: String) = {
    val subDim = PQ_DIMS / PQ_M
    val asgUnion = (1 to PQ_M).map { s =>
      val chain = (1 to subDim).map { j =>
        val i = (s - 1) * subDim + j
        s"(($src.e[$i] - g.ce[$j]) * ($src.e[$i] - g.ce[$j]))"
      }.mkString(" + ")
      s"""SELECT $src.vec_id AS vid, g.code, $s AS sub, $chain AS d
         |FROM $src CROSS JOIN (SELECT code, ce FROM grid WHERE sub = $s) g""".stripMargin
    }.mkString(" UNION ALL ")
    val codeCols = (1 to PQ_M)
      .map(s => s"max(CASE WHEN sub = $s THEN code END) AS c$s").mkString(", ")
    s"""tcl AS (SELECT sub, code, list(val ORDER BY dim) AS ce FROM mt GROUP BY 1, 2),
       |grid AS (SELECT s.sub, p.cid AS code,
       |         coalesce(tcl.ce, p.ce[(CAST((s.sub - 1) * $subDim AS INT) + 1):(CAST(s.sub * $subDim AS INT))]) AS ce
       |         FROM (SELECT unnest(range(1, $PQ_M + 1)) AS sub) s
       |         CROSS JOIN pcent p
       |         LEFT JOIN tcl ON tcl.sub = s.sub AND tcl.code = p.cid),
       |tasg AS ($asgUnion),
       |tcodes AS (SELECT vid, sub, code FROM (SELECT vid, sub, code,
       |           row_number() OVER (PARTITION BY vid, sub ORDER BY d ASC, code ASC) AS rn
       |           FROM tasg) WHERE rn = 1),
       |pcw2 AS (SELECT vid, $codeCols FROM tcodes GROUP BY vid)""".stripMargin.replace("\n", " ")
  }

  private lazy val pqTrainedGridCtes = pqTrainedGridCtesFrom("v")

  /** e10/e13/e14's ADC distance: e10-style chains against `grid`'s
    * trained centroid lists joined per subspace. `qTerm(i)` is the
    * query-side expression for 1-based dimension i — `q.e[$i]` for the
    * raw paths, `(q.e[$i] - qc.ce[$i])` for e22's residual path (left-
    * associative SQL subtraction ≡ the Scala zip_with residual, then
    * the kernel's subtraction — association is the determinism
    * contract).
    */
  private def pqTrainedDistOver(qTerm: Int => String) = {
    val subDim = PQ_DIMS / PQ_M
    (0 until PQ_M).map { s =>
      val chain = (1 to subDim).map { j =>
        val i = s * subDim + j
        s"((${qTerm(i)} - g${s + 1}.ce[$j]) * (${qTerm(i)} - g${s + 1}.ce[$j]))"
      }.mkString(" + ")
      s"($chain)"
    }.mkString(" + ")
  }
  private lazy val pqTrainedDist = pqTrainedDistOver(i => s"q.e[$i]")
  private lazy val pqTrainedGridJoins = (1 to PQ_M)
    .map(s => s"JOIN grid g$s ON g$s.sub = $s AND g$s.code = w.c$s").mkString(" ")

  /** The composed index's candidate-scoring core (consumes the IVF
    * assignment chain's `asg`/`cells`, the trained grid's `pcw2`/`grid`,
    * and `v`): probe selection + trained-ADC scoring, ending in
    * `sc(query_id, neighbor_id, adc_dist)`. THE one fragment behind
    * e14/e15/e16/e20/e21 — a probe or scoring change cannot
    * desynchronize the index's use from its measurements.
    */
  private lazy val ivfPqScCtes =
    s"""probes AS (SELECT vid AS query_id, cid AS cell FROM asg WHERE vid % 50 = 0 AND rn <= $IVF_PROBES),
       |sc AS (SELECT pr.query_id, cl.vid AS neighbor_id, $pqTrainedDist AS adc_dist
       |       FROM probes pr JOIN cells cl USING (cell)
       |       JOIN pcw2 w ON w.vid = cl.vid
       |       JOIN v q ON q.vec_id = pr.query_id
       |       $pqTrainedGridJoins
       |       WHERE cl.vid <> pr.query_id)""".stripMargin.replace("\n", " ")

  /** THE e22 residual chain (mirror of
    * [[graft.operators.Similarity.ivfPqResidualTopK]]): the residual
    * view rv = x − centroid(cell) (list_transform with captured
    * columns — element-wise single subtraction, bit-identical to the
    * Scala zip_with), the PQ chains re-run over rv with seeds at
    * offset IVF_CELLS, and the residual ADC scoring whose query side
    * subtracts the PROBED cell's centroid. Ends in `sc(query_id,
    * neighbor_id, adc_dist)` like [[ivfPqScCtes]], so the same top-k /
    * recall tails stack. Shared by e22 and e23.
    */
  private lazy val residualScCtes =
    s"""rv AS (SELECT n.vec_id,
       |       list_transform(range(1, len(n.e) + 1), i -> n.e[i] - c.ce[i]) AS e
       |       FROM n JOIN cells cl ON cl.vid = n.vec_id
       |       JOIN cent c ON c.cid = cl.cell),
       |${pqCodesAfterVFrom("rv", IVF_CELLS)},
       |${pqMeanCtes("", "pcodes", "rv")},
       |${pqTrainedGridCtesFrom("rv")},
       |probes AS (SELECT vid AS query_id, cid AS cell FROM asg WHERE vid % 50 = 0 AND rn <= $IVF_PROBES),
       |sc AS (SELECT pr.query_id, cl.vid AS neighbor_id,
       |       ${pqTrainedDistOver(i => s"(q.e[$i] - qc.ce[$i])")} AS adc_dist
       |       FROM probes pr JOIN cells cl USING (cell)
       |       JOIN pcw2 w ON w.vid = cl.vid
       |       JOIN v q ON q.vec_id = pr.query_id
       |       JOIN cent qc ON qc.cid = pr.cell
       |       $pqTrainedGridJoins
       |       WHERE cl.vid <> pr.query_id)""".stripMargin.replace("\n", " ")

  /** THE e24 SQ8 chain (mirror of [[graft.operators.Similarity.sq8TopK]]):
    * per-dimension (min, max) training aggregate (no arithmetic, so the
    * driver-collected Scala stats match bit-for-bit), byte codes via the
    * same round/clamp, decode-in-expression, and the sequential-fold
    * distance over the difference vector. Ends in `sq(query_id,
    * neighbor_id, sq_dist)`. Shared by e24 and e25.
    */
  private lazy val sq8Ctes =
    s"""mm AS (SELECT i AS dim, min(e[i]) AS mn, max(e[i]) AS mx
       |       FROM v, LATERAL unnest(range(1, ${PQ_DIMS + 1})) AS t(i) GROUP BY i),
       |ms AS (SELECT dim, mn, CASE WHEN mx > mn THEN (mx - mn) / 255.0 ELSE 1.0 END AS sc FROM mm),
       |cd AS (SELECT v.vec_id, t.i AS dim,
       |       least(255, greatest(0, CAST(round((v.e[t.i] - ms.mn) / ms.sc) AS BIGINT))) AS c,
       |       ms.mn, ms.sc
       |       FROM v, LATERAL unnest(range(1, ${PQ_DIMS + 1})) AS t(i)
       |       JOIN ms ON ms.dim = t.i),
       |dl AS (SELECT vec_id, list(mn + CAST(c AS DOUBLE) * sc ORDER BY dim) AS d
       |       FROM cd GROUP BY vec_id),
       |sqq AS (SELECT vec_id AS query_id, e FROM v WHERE vec_id % 50 = 0),
       |sq AS (SELECT sqq.query_id, c.vec_id AS neighbor_id,
       |       list_dot_product(
       |         list_transform(range(1, ${PQ_DIMS + 1}), i -> sqq.e[i] - c.d[i]),
       |         list_transform(range(1, ${PQ_DIMS + 1}), i -> sqq.e[i] - c.d[i])) AS sq_dist
       |       FROM sqq CROSS JOIN dl c WHERE c.vec_id <> sqq.query_id)""".stripMargin.replace("\n", " ")

  /** THE e26 IVF+SQ8 chain (mirror of
    * [[graft.operators.Similarity.ivfSq8TopK]]; consumes the IVF
    * assignment chain's `asg`/`cells` + `v`): the SAME SQ8 train/
    * encode/decode CTEs as [[sq8Ctes]] with the candidate set
    * probe-bounded instead of CROSS JOIN — ends in `sq(query_id,
    * neighbor_id, sq_dist)`. Shared by e26 and e27; e30 instantiates
    * it once per probe count (the probe bound is the one parameter).
    */
  private lazy val ivfSq8Ctes = ivfSq8CtesAt(IVF_PROBES)

  /** e33's frozen-codebook twist: the quantizer trains on the HISTORY
    * subset only (the 3/4-cut the registered query builds its index
    * on), while assignment/encode/query run over the full corpus — the
    * oracle-side mirror of "corpus grew, codebook frozen".
    */
  private val frozenQuantWhere =
    "WHERE v.vec_id <= (SELECT CAST(floor(3 * max(vec_id) / 4.0) AS BIGINT) FROM embeddings)"

  private def ivfSq8CtesAt(probes: Int, quantWhere: String = "",
      candFilter: String = "", asgCte: String = "asg",
      cellsCte: String = "cells") =
    s"""mm AS (SELECT i AS dim, min(e[i]) AS mn, max(e[i]) AS mx
       |       FROM v, LATERAL unnest(range(1, ${PQ_DIMS + 1})) AS t(i) $quantWhere GROUP BY i),
       |ms AS (SELECT dim, mn, CASE WHEN mx > mn THEN (mx - mn) / 255.0 ELSE 1.0 END AS sc FROM mm),
       |cd AS (SELECT v.vec_id, t.i AS dim,
       |       least(255, greatest(0, CAST(round((v.e[t.i] - ms.mn) / ms.sc) AS BIGINT))) AS c,
       |       ms.mn, ms.sc
       |       FROM v, LATERAL unnest(range(1, ${PQ_DIMS + 1})) AS t(i)
       |       JOIN ms ON ms.dim = t.i),
       |dl AS (SELECT vec_id, list(mn + CAST(c AS DOUBLE) * sc ORDER BY dim) AS d
       |       FROM cd GROUP BY vec_id),
       |probes AS (SELECT vid AS query_id, cid AS cell FROM $asgCte WHERE vid % 50 = 0 AND rn <= $probes),
       |sq AS (SELECT pr.query_id, cl.vid AS neighbor_id,
       |       list_dot_product(
       |         list_transform(range(1, ${PQ_DIMS + 1}), i -> q.e[i] - c.d[i]),
       |         list_transform(range(1, ${PQ_DIMS + 1}), i -> q.e[i] - c.d[i])) AS sq_dist
       |       FROM probes pr JOIN $cellsCte cl USING (cell)
       |       JOIN dl c ON c.vec_id = cl.vid
       |       JOIN v q ON q.vec_id = pr.query_id
       |       WHERE cl.vid <> pr.query_id $candFilter)""".stripMargin.replace("\n", " ")

  /** One branch of the e30 probe curve: the e26 chain at `p` probes,
    * the recall tail AGGREGATED to (n_queries, n_hits) instead of
    * per-query rows, lifted to a self-contained parenthesized WITH so
    * the branches union. Mean recall is one integer sum and one double
    * division — order-independent, matching the Scala exactly.
    */
  private def probeCurveBranch(p: Int) =
    s"""SELECT CAST($p AS BIGINT) AS probes, n_queries, n_hits,
       |  CAST(n_hits AS DOUBLE) / (n_queries * $PQ_K) AS mean_recall FROM (
       |WITH $ivfAsgCtes,
       |${ivfSq8CtesAt(p)},
       |ap3 AS (SELECT query_id, neighbor_id FROM
       |  (SELECT *, row_number() OVER (PARTITION BY query_id
       |     ORDER BY sq_dist ASC, neighbor_id ASC) AS rk FROM sq) WHERE rk <= $PQ_K),
       |pex AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |        list_dot_product(q.e, c.e)/(q.nrm*c.nrm) AS cosine
       |        FROM n q JOIN n c ON q.vec_id % 50 = 0 AND c.vec_id <> q.vec_id),
       |ex3 AS (SELECT query_id, neighbor_id FROM
       |  (SELECT *, row_number() OVER (PARTITION BY query_id
       |     ORDER BY cosine DESC, neighbor_id ASC) AS rk FROM pex) WHERE rk <= $PQ_K),
       |hits AS (SELECT e.query_id, count(*) AS n_hit
       |         FROM ex3 e JOIN ap3 a USING (query_id, neighbor_id) GROUP BY 1),
       |pq AS (SELECT q.query_id, coalesce(n_hit, 0) AS n_hit
       |       FROM (SELECT DISTINCT query_id FROM ex3) q LEFT JOIN hits USING (query_id))
       |SELECT CAST(count(*) AS BIGINT) AS n_queries,
       |  CAST(coalesce(sum(n_hit), 0) AS BIGINT) AS n_hits FROM pq)""".stripMargin.replace("\n", " ")

  /** The two-stage tail (mirror of
    * [[graft.operators.Similarity.rerankExact]]; consumes a shortlist
    * source CTE `src(query_id, neighbor_id, $dist)` + `n`): shortlist at
    * depth RERANK_SHORTLIST by the index's own distance, exact cosine
    * over ONLY shortlist members, re-rank by true cosine — ends in
    * `rrk(query_id, neighbor_id, cosine, rk)`. ONE definition across
    * both two-stage families: e20/e21 stack it on the ADC chain (`sc`),
    * e28/e29 on the IVF+SQ8 chain (`sq`).
    */
  private def rerankCtesOver(src: String, dist: String) =
    s"""shortl AS (SELECT query_id, neighbor_id FROM
       |  (SELECT *, row_number() OVER (PARTITION BY query_id
       |     ORDER BY $dist ASC, neighbor_id ASC) AS rk FROM $src) WHERE rk <= $RERANK_SHORTLIST),
       |rrs AS (SELECT s.query_id, s.neighbor_id,
       |        list_dot_product(q.e, c.e)/(q.nrm*c.nrm) AS cosine
       |        FROM shortl s JOIN n q ON q.vec_id = s.query_id
       |        JOIN n c ON c.vec_id = s.neighbor_id),
       |rrk AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |        ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rk FROM rrs)""".stripMargin.replace("\n", " ")

  private lazy val rerankCtes = rerankCtesOver("sc", "adc_dist")

  /** The recall measurement's shared tail (consumes an `ap3(query_id,
    * neighbor_id)` approximate top-k + `n`): exact cosine baseline,
    * per-query hit count, recall as an exact n/k rational — the final
    * SELECT included. ONE definition across every index family's
    * measurement (e15/e16/e17/e21).
    */
  private lazy val recallTailSql =
    s"""pex AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |        list_dot_product(q.e, c.e)/(q.nrm*c.nrm) AS cosine
       |        FROM n q JOIN n c ON q.vec_id % 50 = 0 AND c.vec_id <> q.vec_id),
       |ex3 AS (SELECT query_id, neighbor_id FROM
       |  (SELECT *, row_number() OVER (PARTITION BY query_id
       |     ORDER BY cosine DESC, neighbor_id ASC) AS rk FROM pex) WHERE rk <= $PQ_K),
       |hits AS (SELECT e.query_id, count(*) AS n_hit
       |         FROM ex3 e JOIN ap3 a USING (query_id, neighbor_id) GROUP BY 1)
       |SELECT q.query_id, CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit,
       |  CAST(coalesce(n_hit, 0) AS DOUBLE) / $PQ_K AS recall
       |FROM (SELECT DISTINCT query_id FROM ex3) q LEFT JOIN hits USING (query_id)
       |ORDER BY query_id""".stripMargin.replace("\n", " ")

  /** Per-(sub, code, dim) DECIMAL(28,8) member means of the codes CTE
    * `codesCte(vid, sub, code)` (consumes a chain defining `v`), ending
    * in `mt$suffix(sub, code, dim, nm, val)` — the mean fold every PQ
    * training pass shares (mirror of Similarity.pqMeans). e11/e12 run
    * it over the seed assignment `pcodes`; e11b runs a second copy over
    * the trained re-assignment `tcodes`.
    */
  private def pqMeanCtes(suffix: String, codesCte: String,
      src: String = "v") = {
    val subDim = PQ_DIMS / PQ_M
    s"""x1$suffix AS (SELECT p.sub, p.code, $src.e, unnest(range(1, $subDim + 1)) AS dim
       |       FROM $codesCte p JOIN $src ON $src.vec_id = p.vid),
       |x2$suffix AS (SELECT sub, code, dim,
       |       CAST(e[CAST((sub - 1) * $subDim + dim AS INT)] AS DECIMAL(28,8)) AS x FROM x1$suffix),
       |mt$suffix AS (SELECT sub, code, dim, count(*) AS nm,
       |       CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS val
       |       FROM x2$suffix GROUP BY 1, 2, 3)""".stripMargin.replace("\n", " ")
  }

  /** The e11 training tail (consumes [[pqCodesCtes]]'s `pcodes`/`v`):
    * ends in `mt(sub, code, dim, nm, val)` — shared by e11 and e12 so
    * training and trained-encoding check against one mean pipeline.
    */
  private lazy val pqTrainCtes = pqMeanCtes("", "pcodes")

  /** Mirror of [[graft.operators.Similarity.nearDupPairs]] as one CTE
    * chain ending in `pairs(a, b, cosine)` — shared by d10 and e05 so a
    * bucketing change cannot desynchronize them.
    */
  private def embedPairsCtes(threshold: Double) =
    s"""v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm,
       |        CAST($annBucket AS BIGINT) AS bucket FROM v),
       |pairs AS (SELECT a.vec_id AS a, b.vec_id AS b,
       |          list_dot_product(a.e, b.e)/(a.nrm*b.nrm) AS cosine
       |          FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |          WHERE list_dot_product(a.e, b.e)/(a.nrm*b.nrm) >= $threshold)""".stripMargin.replace("\n", " ")

  /** The embedding-pairs → exact-closure clusters oracle — ONE string
    * shared by e05 (min-label propagation) and d22 (two-star
    * contraction): both operators implement the same spec, so they are
    * checked against the same recursive-CTE ground truth.
    */
  private lazy val embedClustersSql =
    s"""WITH RECURSIVE ${embedPairsCtes(0.4)},
       |${ccCtes("embeddings", "vec_id")}
       |SELECT v AS vec_id, cluster_id, count(*) OVER (PARTITION BY cluster_id) AS cluster_size
       |FROM lab ORDER BY vec_id""".stripMargin.replace("\n", " ")

  /** Mirror of the connected-components closure
    * ([[graft.operators.Dedup.dedupClusters]]) over a `pairs(a, b)` CTE
    * in scope — ends in `lab(v, cluster_id)`. Shared by d12, e05, d19.
    */
  /** Mirror of [[graft.operators.Unigram]]'s hard-EM chain as CTEs —
    * the INDEPENDENT fixed point: where the Spark side runs a Viterbi
    * DP (argmin per (word, position)), the oracle enumerates EVERY
    * composition of each word into model pieces with a recursive CTE
    * and takes the same (cost, np, path) argmin — agreement proves the
    * DP, not just the arithmetic. One `segCtes(i, model)` instance per
    * EM round: ends in `bw$i(word, wc, np, path)`; `reestCtes(i)`
    * turns bw$i into `m$i(piece, cnt, nll)` (add-one smoothed,
    * single-char coverage kept from the seed m0).
    */
  private def uniSegCtes(i: Int, model: String) =
    s"""useg$i AS (
       |  SELECT word, wc, wlen, CAST(0 AS BIGINT) AS pos,
       |    CAST(0 AS DECIMAL(28,8)) AS cost, CAST(0 AS BIGINT) AS np,
       |    '' AS path FROM uw
       |  UNION ALL
       |  SELECT s.word, s.wc, s.wlen, CAST(s.pos + len(m.piece) AS BIGINT),
       |    CAST(s.cost + m.nll AS DECIMAL(28,8)), CAST(s.np + 1 AS BIGINT),
       |    s.path || '|' || m.piece
       |  FROM useg$i s JOIN $model m
       |    ON m.piece = substr(s.word, CAST(s.pos + 1 AS INTEGER), CAST(len(m.piece) AS INTEGER))
       |  WHERE s.pos < s.wlen),
       |bw$i AS (SELECT word, wc, np, path FROM (
       |  SELECT word, wc, np, path,
       |    row_number() OVER (PARTITION BY word ORDER BY cost, np, path) AS rn
       |  FROM useg$i WHERE pos = wlen) WHERE rn = 1)"""
      .stripMargin.replace("\n", " ")

  private def uniReestCtes(i: Int) =
    s"""uu$i AS (SELECT piece, CAST(sum(wc) AS BIGINT) AS cnt FROM (
       |  SELECT wc, unnest(string_split(substr(path, 2), '|')) AS piece FROM bw$i)
       |  GROUP BY 1),
       |ub$i AS (SELECT s.piece, coalesce(u.cnt, CAST(0 AS BIGINT)) AS cnt
       |  FROM (SELECT piece FROM um0 WHERE len(piece) = 1) s
       |  LEFT JOIN uu$i u USING (piece)
       |  UNION ALL SELECT piece, cnt FROM uu$i WHERE len(piece) > 1),
       |uc$i AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot, CAST(count(*) AS BIGINT) AS v FROM ub$i),
       |um$i AS (SELECT piece, cnt,
       |  CAST(ln(CAST(tot + v AS DOUBLE) / CAST(cnt + 1 AS DOUBLE)) AS DECIMAL(28,8)) AS nll
       |  FROM ub$i CROSS JOIN uc$i)""".stripMargin.replace("\n", " ")

  /** The full d101/d102 chain: vocabulary, seed model um0, then UNI_EM
    * rounds of segment + re-estimate, ending in `um$UNI_EM` (the final
    * model) and `bw$UNI_EM`-equivalents; the final segmentation for the
    * encoder is one more seg pass under the final model
    * (`uniSegCtes(UNI_EM + 1, ...)` — mirrors unigramEncode's extra
    * Viterbi).
    */
  private def uniChainCtes(rounds: Int) = {
    val em = (1 to rounds).map(i =>
      uniSegCtes(i, s"um${i - 1}") + ", " + uniReestCtes(i)).mkString(", ")
    s"""uw AS (SELECT word, CAST(count(*) AS BIGINT) AS wc,
       |  CAST(len(word) AS BIGINT) AS wlen FROM
       |  (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |  GROUP BY 1),
       |usub AS (SELECT substr(word, CAST(i + 1 AS INTEGER), CAST(l AS INTEGER)) AS piece, wc
       |  FROM uw, LATERAL unnest(range(0, wlen)) AS t(i),
       |       LATERAL unnest(range(1, least($UNI_L, wlen - i) + 1)) AS t2(l)),
       |usc AS (SELECT piece, CAST(sum(wc) AS BIGINT) AS cnt FROM usub GROUP BY 1),
       |ust AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM usc),
       |um0 AS (SELECT piece, cnt,
       |  CAST(ln(CAST(tot AS DOUBLE) / CAST(cnt AS DOUBLE)) AS DECIMAL(28,8)) AS nll
       |  FROM usc CROSS JOIN ust)""".stripMargin.replace("\n", " ") +
      ", " + em
  }

  /** The d106 oracle body over a corpus slice — `where` narrows the
    * source (d114/d115 run the maintenance round trips on a quarter
    * slice, the d78/d79 self-containment-pricing convention; d106
    * itself uses TRUE). Append/sync must reproduce the LCP array
    * row-for-row on their slice.
    */
  private def sfxLcpSqlOver(where: String) =
    s"""WITH st AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE $where),
       |sfx AS (SELECT doc_id, CAST(t.i AS BIGINT) AS pos,
       |  w[CAST(t.i + 1 AS INTEGER):] AS sl,
       |  array_to_string(w[CAST(t.i + 1 AS INTEGER):], ' ') AS suf
       |  FROM st, LATERAL unnest(range(0, len(w))) AS t(i)),
       |rnk AS (SELECT doc_id, pos, sl,
       |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY suf) AS BIGINT) AS rnk
       |  FROM sfx),
       |adj AS (SELECT a.doc_id, a.rnk, a.pos, a.sl AS sa, b.sl AS sb
       |  FROM rnk a JOIN rnk b ON a.doc_id = b.doc_id AND b.rnk = a.rnk - 1)
       |SELECT doc_id, rnk, pos,
       |  coalesce(nullif(list_position(
       |      list_transform(range(1, least(len(sa), len(sb)) + 1), i -> sa[i] = sb[i]),
       |      false), 0) - 1,
       |    CAST(least(len(sa), len(sb)) AS BIGINT)) + ${asciiGuard("d106")} AS lcp
       |FROM adj ORDER BY doc_id, rnk""".stripMargin.replace("\n", " ")

  /** The d61 oracle body — shared verbatim by d113 (the persisted
    * merge table must reproduce the in-memory encoding).
    */
  private lazy val bpeEncodeSql =
    s"""WITH $bpeHeadCtes,
       |$bpeMergeStages,
       |enc AS (SELECT word, CAST(len(string_split(rep, '¦')) AS BIGINT) AS n_syms
       |  FROM br$BPE_MERGES),
       |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(n_syms) AS BIGINT) AS n_tokens_bpe
       |FROM tok JOIN enc USING (word) GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin.replace("\n", " ")

  /** The d102 oracle body — shared verbatim by d104 (the persisted
    * store must reproduce the in-memory segmentation).
    */
  private lazy val uniEncodeSql =
    s"""WITH RECURSIVE ${uniChainCtes(UNI_EM)},
       |${uniSegCtes(UNI_EM + 1, s"um$UNI_EM")},
       |uenc AS (SELECT d.doc_id, b.np
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) d
       |  JOIN bw${UNI_EM + 1} b USING (word))
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(np) AS BIGINT) AS n_pieces,
       |  CAST(sum(np) AS DOUBLE) / count(*) AS fertility
       |FROM uenc GROUP BY 1 ORDER BY doc_id""".stripMargin.replace("\n", " ")

  private def ccCtes(seedTable: String, idCol: String) =
    s"""edges AS (SELECT a AS v, b AS w FROM pairs UNION ALL SELECT b AS v, a AS w FROM pairs),
       |reach AS (SELECT $idCol AS v, $idCol AS lbl FROM $seedTable
       |          UNION
       |          SELECT e.w AS v, r.lbl FROM reach r JOIN edges e ON e.v = r.v),
       |lab AS (SELECT v, min(lbl) AS cluster_id FROM reach GROUP BY v)""".stripMargin.replace("\n", " ")

  /** Mirror of [[graft.operators.Dedup.contamination]] over an `shh`
    * CTE in scope — ends in `hits(doc_id, n_hits)` for the train split.
    * Shared by d13 and d19.
    */
  private val contaminationCtes =
    """ev AS (SELECT DISTINCT hs FROM shh WHERE doc_id % 10 = 0),
      |tr AS (SELECT doc_id, hs FROM shh WHERE doc_id % 10 <> 0),
      |hits AS (SELECT tr.doc_id, count(*) AS n_hits FROM tr JOIN ev USING (hs) GROUP BY tr.doc_id)""".stripMargin.replace("\n", " ")

  /** Mirror of [[graft.operators.TextAnalysis.repetition]] — ends in
    * `reps(doc_id, n_tokens, dup_token_frac, top_ngram_frac)`. Shared
    * by d14 and d19.
    */
  private val repetitionCtes =
    """t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
      |base AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n_tokens,
      |         CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct FROM t),
      |g AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
      |        i -> array_to_string(list_slice(w, i, i+1), ' '))) AS g
      |      FROM base WHERE len(w) >= 2),
      |topg AS (SELECT doc_id, max(c) AS top_c, sum(c) AS n_grams
      |        FROM (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2) GROUP BY doc_id),
      |reps AS (SELECT b.doc_id, b.n_tokens,
      |  1.0 - CAST(n_distinct AS DOUBLE)/n_tokens AS dup_token_frac,
      |  coalesce(CAST(top_c AS DOUBLE)/n_grams, 0.0) AS top_ngram_frac
      |  FROM base b LEFT JOIN topg USING (doc_id))""".stripMargin.replace("\n", " ")

  /** Mirror of [[graft.operators.TextAnalysis.bigramLm]] — ends in
    * `lm(doc_id, n_bigrams, avg_nll)`. The zipped parallel unnests over
    * list_slice(w,1,n-1)/list_slice(w,2,n) are DuckDB's spelling of the
    * adjacent-pair stream; per-gram nll is rounded to DECIMAL(28,8) in
    * the model CTE exactly once (the cross-engine agreement device), so
    * the per-doc decimal sum and the one final double divide are exact.
    * Shared by d45 and d46.
    */
  private val bigramLmCtes =
    """lt AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
      |lg AS (SELECT doc_id, unnest(list_slice(w, 1, len(w)-1)) AS prev,
      |        unnest(list_slice(w, 2, len(w))) AS cur FROM lt WHERE len(w) >= 2),
      |lc2 AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS c2 FROM lg GROUP BY 1, 2),
      |lc1 AS (SELECT prev, CAST(sum(c2) AS BIGINT) AS c1 FROM lc2 GROUP BY 1),
      |lv AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS v
      |       FROM (SELECT unnest([prev, cur]) AS t FROM lc2)),
      |lmodel AS (SELECT prev, cur,
      |  CAST(ln(CAST(c1 + v AS DOUBLE) / CAST(c2 + 1 AS DOUBLE)) AS DECIMAL(28,8)) AS nll
      |  FROM lc2 JOIN lc1 USING (prev) CROSS JOIN lv),
      |lm AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |  CAST(sum(nll) AS DOUBLE) / count(*) AS avg_nll
      |  FROM lg JOIN lmodel USING (prev, cur) GROUP BY doc_id)""".stripMargin.replace("\n", " ")

  /** Mirror of [[graft.operators.Packing.tokenOffsets]] (bucketBits=8)
    * — ends in `pos(doc_id, n_tokens, start_token)`: hash60 order key,
    * high-8-bit bucket, within-bucket running sums plus per-bucket base
    * offsets. Shared by d47 and d48.
    */
  /** The distributed-prefix-sum chain ([[graft.operators.Packing]]
    * `tokenOffsets` mirror) with prefixed CTE names and an optional
    * source filter, so d51 can run it twice in one query (history
    * frozen, increment offset) without name collisions. Ends in
    * `${p}os(doc_id, n_tokens, start_token)`; `${p}b` carries the raw
    * (doc_id, n_tokens, k) rows for totals.
    */
  private def tokenOffsetCtesFor(p: String, where: String = "") =
    s"""${p}b AS (SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
       |  ${duckHash60("CAST(doc_id AS VARCHAR)")} AS k FROM documents $where),
       |${p}bb AS (SELECT *, k >> 52 AS bkt FROM ${p}b),
       |${p}wc AS (SELECT *, sum(n_tokens) OVER (PARTITION BY bkt ORDER BY k, doc_id) AS cum FROM ${p}bb),
       |${p}bo AS (SELECT bkt, CAST(sum(bt) OVER (ORDER BY bkt) - bt AS BIGINT) AS off
       |        FROM (SELECT bkt, sum(n_tokens) AS bt FROM ${p}bb GROUP BY 1)),
       |${p}os AS (SELECT doc_id, n_tokens, CAST(off + cum - n_tokens AS BIGINT) AS start_token
       |        FROM ${p}wc JOIN ${p}bo USING (bkt))""".stripMargin.replace("\n", " ")

  // the shared single-corpus instance: names pb/pbb/pwc/pbo/pos, exactly
  // the chain d47/d48/d50 have always composed over
  private val tokenOffsetCtes = tokenOffsetCtesFor("p")

  /** The d121 fold-pairing placement as shared CTE fragments over any
    * (doc_id, text) source — d121 runs it on `documents`, d135 on the
    * curation survivors.
    */
  private def pairPackCtes(src: String): String =
    s"""l AS (SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM $src),
       |r AS (SELECT doc_id, n_tokens,
       |    CAST(row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS BIGINT) AS rnk,
       |    CAST(count(*) OVER () AS BIGINT) AS n_total FROM l),
       |j AS (SELECT a.doc_id, a.n_tokens, a.rnk,
       |    a.n_total + 1 - a.rnk AS prnk, b.n_tokens AS p_tokens
       |  FROM r a JOIN r b ON b.rnk = a.n_total + 1 - a.rnk)""".stripMargin

  private val pairPackSelect =
    s"""SELECT doc_id, n_tokens, rnk,
       |  CAST(CASE WHEN rnk <> prnk AND n_tokens + p_tokens <= $PAIR_CTX
       |    THEN least(rnk, prnk) ELSE rnk END AS BIGINT) AS bin_id,
       |  CAST(CASE WHEN rnk <> prnk AND n_tokens + p_tokens <= $PAIR_CTX
       |    AND rnk > prnk THEN 1 ELSE 0 END AS BIGINT) AS slot
       |FROM j""".stripMargin

  /** The d124 proximity-rerank chain as a shared CTE fragment (the
    * shared-chain convention): BM25 top-`FUSE_K` pool, d100's position
    * formulation, per-term join chain for the min cover window, ending
    * in `rr(doc_id, n_present, span, score, rk)` — d124 cuts it at
    * `FUSE_OUT`; d128 evaluates it against term-coverage relevance.
    */
  private def proximityCtes(terms: Seq[String]): String = {
    val joins = terms.indices.tail.map { i =>
      s"JOIN tok a$i ON a$i.doc_id = a0.doc_id AND a$i.word = '${terms(i)}'"
    }.mkString(" ")
    val ps = terms.indices.map(i => s"a$i.pos").mkString(", ")
    s"""${bm25CtesFor(terms, "px")},
       |pool AS (SELECT doc_id, score FROM pxsc
       |  ORDER BY score DESC, doc_id LIMIT $FUSE_K),
       |base AS (SELECT d.doc_id, string_split(d.text, ' ') AS w
       |  FROM documents d JOIN pool USING (doc_id)),
       |tok AS (SELECT doc_id, CAST(t.i AS BIGINT) AS pos, w[t.i + 1] AS word
       |  FROM base, LATERAL unnest(range(0, len(w))) AS t(i)
       |  WHERE w[t.i + 1] IN (${terms.map(t => s"'$t'").mkString(", ")})),
       |pres AS (SELECT doc_id, CAST(count(DISTINCT word) AS BIGINT) AS n_present
       |  FROM tok GROUP BY 1),
       |spans AS (SELECT a0.doc_id,
       |    CAST(min(greatest($ps) - least($ps) + 1) AS BIGINT) AS span
       |  FROM tok a0 $joins WHERE a0.word = '${terms.head}' GROUP BY 1),
       |rr AS (SELECT p.doc_id, coalesce(n_present, 0) AS n_present, span, score,
       |    CAST(row_number() OVER (ORDER BY coalesce(n_present, 0) DESC,
       |      span ASC NULLS LAST, score DESC, p.doc_id) AS BIGINT) AS rk
       |  FROM pool p LEFT JOIN pres USING (doc_id) LEFT JOIN spans USING (doc_id))"""
      .stripMargin.replace("\n", " ")
  }

  /** e52 oracle: the MMR greedy unrolled as chained CTEs — step i picks
    * argmax(0.5·rel − 0.5·max sim to steps 1..i−1) over the pool rows
    * not yet selected, exactly the driver loop's IEEE arithmetic
    * ([[graft.operators.Similarity.mmrRerank]]); ties break on id. The
    * pool and pairwise CTEs are e01's cosine chain (dot products are
    * orientation-independent bit-for-bit: IEEE multiply commutes and
    * both engines fold in index order).
    */
  private def mmrOracleSql(qid: Long, poolK: Int, outK: Int,
      ann: Boolean = false): String = {
    val bucketCol = if (ann) s", CAST($annBucket AS BIGINT) AS bucket" else ""
    val bucketCond = if (ann) " AND c.bucket = q.bucket" else ""
    val steps = (1 to outK).map { i =>
      if (i == 1)
        s"""s1 AS (SELECT CAST(1 AS BIGINT) AS rk, id, rel,
           |  CAST(0.5 AS DOUBLE) * rel - CAST(0.5 AS DOUBLE) * CAST(0 AS DOUBLE) AS mmr
           |  FROM pool ORDER BY mmr DESC, id LIMIT 1)""".stripMargin
      else {
        val prev = (1 until i).map(j => s"SELECT id FROM s$j").mkString(" UNION ALL ")
        s"""s$i AS (SELECT CAST($i AS BIGINT) AS rk, id, rel,
           |  CAST(0.5 AS DOUBLE) * rel - CAST(0.5 AS DOUBLE) * ms AS mmr FROM
           |  (SELECT p.id, p.rel, max(w.cos) AS ms FROM pool p
           |   JOIN pw w ON w.ida = p.id AND w.idb IN ($prev)
           |   WHERE p.id NOT IN ($prev) GROUP BY p.id, p.rel)
           |  ORDER BY mmr DESC, id LIMIT 1)""".stripMargin
      }
    }
    val union = (1 to outK).map(i => s"SELECT * FROM s$i").mkString(" UNION ALL ")
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm$bucketCol FROM v),
       |pool AS (SELECT c.vec_id AS id,
       |    list_dot_product(q.e, c.e)/(q.nrm*c.nrm) AS rel
       |  FROM n q JOIN n c ON q.vec_id = $qid AND c.vec_id <> $qid$bucketCond
       |  ORDER BY rel DESC, id LIMIT $poolK),
       |pw AS (SELECT a.id AS ida, b.id AS idb,
       |    list_dot_product(x.e, y.e)/(x.nrm*y.nrm) AS cos
       |  FROM pool a JOIN pool b ON a.id <> b.id
       |  JOIN n x ON x.vec_id = a.id JOIN n y ON y.vec_id = b.id),
       |${steps.mkString(", ")}
       |SELECT rk, id AS neighbor_id, rel AS relevance, mmr FROM ($union)
       |ORDER BY rk""".stripMargin.replace("\n", " ")
  }

  /** One add-one bigram model as a prefixed CTE chain (the d49 oracle's
    * model fragments, parameterized): trained on `documents $where`,
    * ending in `${p}model(prev, cur, nll)`, `${p}ctx(prev, unseen_nll)`
    * and `${p}uv(oov_nll)`. d53 composes two instances (target vs
    * corpus) in one query.
    */
  private def bigramModelCtes(p: String, where: String) =
    s"""${p}t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents $where),
       |${p}g AS (SELECT unnest(list_slice(w, 1, len(w)-1)) AS prev,
       |        unnest(list_slice(w, 2, len(w))) AS cur FROM ${p}t WHERE len(w) >= 2),
       |${p}c2 AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS c2 FROM ${p}g GROUP BY 1, 2),
       |${p}c1 AS (SELECT prev, CAST(sum(c2) AS BIGINT) AS c1 FROM ${p}c2 GROUP BY 1),
       |${p}v AS (SELECT CAST(count(DISTINCT t2) AS BIGINT) AS v
       |       FROM (SELECT unnest([prev, cur]) AS t2 FROM ${p}c2)),
       |${p}model AS (SELECT prev, cur,
       |  CAST(ln(CAST(c1 + v AS DOUBLE) / CAST(c2 + 1 AS DOUBLE)) AS DECIMAL(28,8)) AS nll
       |  FROM ${p}c2 JOIN ${p}c1 USING (prev) CROSS JOIN ${p}v),
       |${p}ctx AS (SELECT prev, CAST(ln(CAST(c1 + v AS DOUBLE)) AS DECIMAL(28,8)) AS unseen_nll
       |  FROM ${p}c1 CROSS JOIN ${p}v),
       |${p}uv AS (SELECT CAST(ln(CAST(v AS DOUBLE)) AS DECIMAL(28,8)) AS oov_nll FROM ${p}v)"""
      .stripMargin.replace("\n", " ")

  /** Mirror of [[graft.operators.Classifier]]'s batch-perceptron
    * training trajectory (d68/d69), generated pass-by-pass with the
    * same loop the Scala driver runs: `pw0` is the zero vector, each
    * pass k adds one margin CTE (`pm\$k`), one gradient CTE over the
    * misclassified docs (`pg\$k`), and the updated weights (`pw\$k`).
    * Everything is BIGINT — no rounding device needed anywhere.
    * Ends in `pw$CLS_PASSES(bucket, wt)` plus `pfeat`/`plab` for the
    * scoring tail.
    */
  /** Hashed feature/label CTEs for one doc slice: `${pfx}feat(doc_id,
    * bucket, x)` and `${pfx}lab(doc_id, y)`.
    */
  private def pFeatCtes(pfx: String, where: String): String = {
    val B = CLS_BUCKETS
    s"""${pfx}tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS token FROM documents $where),
       |${pfx}feat AS (SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS x FROM (
       |  SELECT doc_id, ${duckHash60("token")} % $B AS bucket FROM ${pfx}tok
       |  UNION ALL SELECT doc_id, CAST($B AS BIGINT) AS bucket FROM documents $where)
       |  GROUP BY doc_id, bucket),
       |${pfx}lab AS (SELECT doc_id, CAST(CASE WHEN lang='en' THEN 1 ELSE -1 END AS BIGINT) AS y FROM documents $where)"""
      .stripMargin.replace("\n", " ")
  }

  /** The zero weight vector as a CTE. */
  private def pZeroCte(name: String): String =
    s"$name AS (SELECT CAST(range AS BIGINT) AS bucket, CAST(0 AS BIGINT) AS wt FROM range(0, ${CLS_BUCKETS + 1}))"

  /** Perceptron pass CTEs `${pfx}m$k/${pfx}g$k/${pfx}w$k` for k in
    * [from, to] over `${featPfx}feat`/`${featPfx}lab`, starting from
    * weights CTE `w0` — one margin pass, one gradient over the
    * misclassified docs, one update, exactly the Scala driver loop.
    */
  private def pPassCtes(pfx: String, featPfx: String, w0: String,
      from: Int, to: Int): String =
    (from to to).map { k =>
      val prev = if (k == from) w0 else s"${pfx}w${k - 1}"
      s"""${pfx}m$k AS (SELECT f.doc_id, CAST(sum(f.x * w.wt) AS BIGINT) AS m
         |  FROM ${featPfx}feat f JOIN $prev w USING (bucket) GROUP BY f.doc_id),
         |${pfx}g$k AS (SELECT f.bucket, CAST(sum(l.y * f.x) AS BIGINT) AS g
         |  FROM ${pfx}m$k m JOIN ${featPfx}lab l USING (doc_id) JOIN ${featPfx}feat f USING (doc_id)
         |  WHERE l.y * m.m <= 0 GROUP BY f.bucket),
         |${pfx}w$k AS (SELECT w.bucket, CAST(w.wt + coalesce(g.g, 0) AS BIGINT) AS wt
         |  FROM $prev w LEFT JOIN ${pfx}g$k g USING (bucket))"""
        .stripMargin.replace("\n", " ")
    }.mkString(", ")

  /** Mirror of [[graft.operators.Classifier]]'s batch-perceptron
    * training trajectory (d68/d69/d73), generated pass-by-pass with the
    * same loop the Scala driver runs: `pw0` is the zero vector, each
    * pass k adds one margin CTE, one gradient CTE over the
    * misclassified docs, and the updated weights. Everything is BIGINT
    * — no rounding device needed anywhere. Ends in
    * `pw$CLS_PASSES(bucket, wt)` plus `pfeat`/`plab` for scoring tails.
    */
  private lazy val perceptronCtes: String =
    s"""${pFeatCtes("p", "")},
       |${pZeroCte("pw0")},
       |${pPassCtes("p", "p", "pw0", 1, CLS_PASSES)}"""
      .stripMargin.replace("\n", " ")

  /** Mirror of the d75/d76 warm-start trajectory: history chain from
    * zero over the 3/4-cut slice, ONE continuation pass over the
    * increment slice seeded with the history weights (the online-
    * learning update — NOT a retrain), full corpus served under the
    * result. Shared by d75 (explicit update) and d76 (sync's update
    * path), which must be margin-identical.
    */
  private lazy val classifierUpdateSql: String =
    s"""WITH cutv AS (SELECT CAST(max(doc_id) * 3 // 4 AS BIGINT) AS cut FROM documents),
       |${pFeatCtes("h", "WHERE doc_id <= (SELECT cut FROM cutv)")},
       |${pZeroCte("hw0")},
       |${pPassCtes("h", "h", "hw0", 1, CLS_PASSES)},
       |${pFeatCtes("i", "WHERE doc_id > (SELECT cut FROM cutv)")},
       |${pPassCtes("i", "i", s"hw$CLS_PASSES", 1, 1)},
       |${pFeatCtes("f", "")},
       |pfin AS (SELECT f.doc_id, CAST(sum(f.x * w.wt) AS BIGINT) AS margin
       |  FROM ffeat f JOIN iw1 w USING (bucket) GROUP BY f.doc_id)
       |SELECT doc_id, margin, (margin > 0) AS predicted
       |FROM pfin ORDER BY doc_id"""
      .stripMargin.replace("\n", " ")

  /** THE d17 BM25 chain (mirror of [[graft.operators.TextAnalysis]]
    * `bm25`): expression order/parenthesization matched exactly (every
    * op is +,-,*,/ over doubles — bit-identical). Shared by d17 and
    * d87 (indexed scoring must equal the batch kernel).
    */
  private lazy val bm25Sql: String =
    s"""WITH ${bm25CtesFor(BM25_TERMS, "q")}
       |SELECT doc_id, score FROM qsc ORDER BY doc_id"""
      .stripMargin.replace("\n", " ")

  /** The d17 chain with prefixed CTE names and caller-chosen terms, so
    * d89 can run one instance per retrieval query in a single oracle
    * without name collisions; `from` selects the scored corpus (a CTE
    * with (doc_id, text) — d116 feeds deduped chunks). Ends in
    * `${p}sc(doc_id, score)`.
    */
  private def bm25CtesFor(terms: Seq[String], p: String,
      from: String = "documents"): String = {
    val dfSelects = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(sum(CASE WHEN list_contains(string_split(text,' '), '$t') THEN 1 ELSE 0 END) AS DOUBLE) AS df$i"
    }.mkString(", ")
    val tfSelects = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(w, x -> x = '$t')) AS DOUBLE) AS tf$i"
    }.mkString(", ")
    val scoreSum = terms.indices.map { i =>
      s"((nd - df$i + 0.5)/(df$i + 0.5)) * (tf$i * (1.2 + 1.0)) / (tf$i + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / (sum_dl / nd))))"
    }.mkString(" + ")
    s"""${p}st AS (SELECT CAST(count(*) AS DOUBLE) AS nd,
       |  CAST(sum(len(string_split(text,' '))) AS DOUBLE) AS sum_dl,
       |  $dfSelects FROM $from),
       |${p}d AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl, $tfSelects
       |      FROM (SELECT doc_id, string_split(text,' ') AS w FROM $from)),
       |${p}sc AS (SELECT doc_id, $scoreSum AS score FROM ${p}d CROSS JOIN ${p}st)"""
      .stripMargin.replace("\n", " ")
  }

  /** Mirror of [[graft.operators.Classifier.classifySelectTop]] over
    * the shared perceptron chain: margins, the bucketed rank (negated
    * margin floor-shifted by 8 — both engines' `>>` is arithmetic on
    * signed integers), the num/den cut. Ends in
    * `csel(doc_id, margin, rnk, selected)`; shared by d86 and d85's
    * classifier leg.
    */
  private lazy val classifierTopCutCtes: String =
    s"""pfin AS (SELECT f.doc_id, CAST(sum(f.x * w.wt) AS BIGINT) AS margin
       |  FROM pfeat f JOIN pw$CLS_PASSES w USING (bucket) GROUP BY f.doc_id),
       |cbk AS (SELECT doc_id, margin, (-margin) >> 8 AS bkt FROM pfin),
       |cbc AS (SELECT bkt, CAST(count(*) AS BIGINT) AS bc FROM cbk GROUP BY 1),
       |cbo AS (SELECT bkt, CAST(sum(bc) OVER (ORDER BY bkt) - bc AS BIGINT) AS off FROM cbc),
       |ctot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM pfin),
       |crk AS (SELECT doc_id, margin,
       |  CAST(off + row_number() OVER (PARTITION BY bkt ORDER BY margin DESC, doc_id) AS BIGINT) AS rnk
       |  FROM cbk JOIN cbo USING (bkt)),
       |csel AS (SELECT doc_id, margin, rnk, ((rnk - 1) * 2 < n_total * 1) AS selected
       |  FROM crk CROSS JOIN ctot)""".stripMargin.replace("\n", " ")

  /** The d85 verdict legs as ONE CTE bundle — the perceptron chain, the
    * d46 tier chain (ending in `tser`), the d86 cut (ending in `csel`),
    * and the d19 keep query wrapped as a derived table (it carries its
    * own WITH RECURSIVE scope; ends in `ck`). Shared by d85 (verdict
    * rows) and d88 (selection → placement), so the two rows' selection
    * semantics cannot drift apart.
    */
  private lazy val fullCurationCtes: String =
    s"""$perceptronCtes,
       |$bigramLmCtes,
       |ls AS (SELECT doc_id, avg_nll,
       |       CAST(floor(avg_nll * $LM_SCALE) AS BIGINT) AS bkt FROM lm),
       |lbc AS (SELECT bkt, CAST(count(*) AS BIGINT) AS bc FROM ls GROUP BY 1),
       |lbo AS (SELECT bkt, CAST(sum(bc) OVER (ORDER BY bkt) - bc AS BIGINT) AS off FROM lbc),
       |ltot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM lm),
       |lrk AS (SELECT doc_id, avg_nll,
       |  CAST(off + row_number() OVER (PARTITION BY bkt ORDER BY avg_nll, doc_id) AS BIGINT) AS rnk
       |  FROM ls JOIN lbo USING (bkt)),
       |tser AS (SELECT doc_id,
       |  CASE WHEN (rnk - 1) * 3 < n_total THEN 'head'
       |       WHEN (rnk - 1) * 3 < 2 * n_total THEN 'middle'
       |       ELSE 'tail' END AS tier
       |  FROM lrk CROSS JOIN ltot),
       |$classifierTopCutCtes,
       |ck AS (SELECT doc_id, keep FROM ($curationKeepSql) ckq)"""
      .stripMargin.replace("\n", " ")

  /** The shared d53/d54 scoring chain: both models joined against one
    * gram stream, ending in `sc(doc_id, t_eff, c_eff)`.
    */
  private lazy val dsirScoreCtes =
    s"""${bigramModelCtes("t", "WHERE lang = 'en'")},
       |${bigramModelCtes("c", "")},
       |sg AS (SELECT doc_id,
       |  unnest(list_slice(w, 1, len(w)-1)) AS prev,
       |  unnest(list_slice(w, 2, len(w))) AS cur
       |  FROM (SELECT doc_id, string_split(text,' ') AS w FROM documents)
       |  WHERE len(w) >= 2),
       |sc AS (SELECT doc_id,
       |  coalesce(tm.nll, tx.unseen_nll, tv.oov_nll) AS t_eff,
       |  coalesce(cm.nll, cx.unseen_nll, cv.oov_nll) AS c_eff
       |  FROM sg
       |  LEFT JOIN tmodel tm USING (prev, cur) LEFT JOIN tctx tx USING (prev)
       |  CROSS JOIN tuv tv
       |  LEFT JOIN cmodel cm USING (prev, cur) LEFT JOIN cctx cx USING (prev)
       |  CROSS JOIN cuv cv)""".stripMargin.replace("\n", " ")

  /** The blockwise 60-bit fingerprint (mirror of
    * [[graft.operators.Multimodal.mediaPhash]]) in the VARCHAR domain —
    * exact only while the corpus is pure ASCII (the m03 device; the
    * guard is appended by each consumer). `t` is the text expression.
    */
  private def duckPhash(t: String) =
    s"""CAST(list_sum(list_transform(range(0, 60), i ->
       |  CASE WHEN substr(md5(substring($t, CAST(i * greatest(1, length($t) // 60) + 1 AS INT),
       |    greatest(1, length($t) // 60))), 1, 1)
       |    IN ('1','3','5','7','9','b','d','f')
       |  THEN (1::BIGINT << CAST(i AS INT)) ELSE 0::BIGINT END)) AS BIGINT)"""
      .stripMargin.replace("\n", " ")

  /** The m03/m05/m06 ASCII-precondition guard: a BIGINT zero that
    * errors loudly if any doc's byte length differs from its char
    * length. Add it to an integer output column.
    */
  /** Mirror of the m08 indexed-probe chain (shared by m09's sync round
    * trip): history/increment phashes, block rows, the pigeonhole
    * equi-join, banded candidate counts, best within-radius match with
    * lowest-id ties, verdict. ASCII guard rides n_cand (the duckPhash
    * exactness precondition, as in m06).
    */
  private lazy val phashIndexedSql: String =
    phashIndexedSqlFor("doc_id % 4 <> 0")

  /** The m08 probe chain with a parameterized index-side membership
    * filter — m08/m09 pass the plain history predicate; m12 cuts it at
    * snapshot v1's watermark (the as-of read's doc_id cut).
    */
  private def phashIndexedSqlFor(histWhere: String): String = {
    val nb = SIMHASH_RADIUS + 1
    val bits = 60 / nb
    val mask = (1L << bits) - 1
    def blkCte(name: String, src: String) =
      s"""$name AS (SELECT doc_id, phash, b AS bpos,
         |  CAST((phash >> CAST(b * $bits AS INT)) & $mask AS BIGINT) AS bval
         |  FROM $src, LATERAL unnest(range(0, $nb)) AS u(b))""".stripMargin
    s"""WITH hist AS (SELECT doc_id, text AS t FROM documents WHERE $histWhere),
       |incr AS (SELECT doc_id, text AS t FROM documents WHERE doc_id % 4 = 0
       |  UNION ALL SELECT doc_id + 2000000, 'Z' || substring(text, 2, length(text) - 1)
       |  FROM documents WHERE doc_id % 4 = 1),
       |hp AS (SELECT doc_id, ${duckPhash("t")} AS phash FROM hist),
       |ip AS (SELECT doc_id, ${duckPhash("t")} AS phash FROM incr),
       |${blkCte("hblk", "hp")},
       |${blkCte("iblk", "ip")},
       |pcand AS (SELECT DISTINCT i.doc_id AS nid, h.doc_id AS hid,
       |  i.phash AS pa, h.phash AS pb
       |  FROM iblk i JOIN hblk h ON i.bpos = h.bpos AND i.bval = h.bval),
       |psc AS (SELECT nid, hid, CAST(bit_count(xor(pa, pb)) AS BIGINT) AS ham FROM pcand),
       |pnc AS (SELECT nid, CAST(count(*) AS BIGINT) AS n_cand FROM psc GROUP BY 1),
       |pwi AS (SELECT * FROM psc WHERE ham <= $SIMHASH_RADIUS),
       |pbs AS (SELECT nid, CAST(min(ham) AS BIGINT) AS best_hamming FROM pwi GROUP BY 1),
       |pdf AS (SELECT w.nid, min(w.hid) AS dup_of FROM pwi w
       |  JOIN pbs ON pbs.nid = w.nid AND w.ham = pbs.best_hamming GROUP BY w.nid)
       |SELECT i.doc_id, coalesce(n_cand, 0) + ${asciiGuard("m08")} AS n_cand,
       |  dup_of, best_hamming, (best_hamming IS NOT NULL) AS is_dup
       |FROM incr i LEFT JOIN pnc ON pnc.nid = i.doc_id
       |LEFT JOIN pbs ON pbs.nid = i.doc_id LEFT JOIN pdf ON pdf.nid = i.doc_id
       |ORDER BY i.doc_id""".stripMargin.replace("\n", " ")
  }

  /** The m08/m09 probe set: every fresh %4=0 blob plus a same-length
    * single-byte-corrupted twin (id + 2000000) of each %4=1 HISTORY
    * blob — the twin differs from its original in at most the first
    * fingerprint block, so the pigeonhole join must flag it.
    */
  private def phashProbeSet(media: org.apache.spark.sql.DataFrame) =
    media.filter(col("doc_id") % 4 === 0).unionByName(
      media.filter(col("doc_id") % 4 === 1)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          expr("cast(concat(cast('Z' as binary), substring(payload, 2, octet_length(payload) - 1)) as binary)")
            .as("payload"),
          col("lang"), col("source")))

  private def asciiGuard(name: String) =
    s"""CASE WHEN (SELECT count(*) FROM documents
       |  WHERE octet_length(encode(text)) <> length(text)) > 0
       |  THEN CAST(error('$name oracle precondition violated: corpus is not pure ASCII') AS BIGINT)
       |  ELSE 0 END""".stripMargin.replace("\n", " ")

  /** The k-center greedy chain (mirror of
    * [[graft.operators.Similarity.kCenterGreedy]]) — consumes `n`,
    * yields `kc1..kcK` (vec_id, e, nrm[, md]) and the running
    * min-distance tables `km1..kmK`. Shared by e47 and e48.
    */
  private lazy val kcenterStageCtes = kcenterStagesTo(KCENTER_K)

  /** The greedy k-center stage chain up to `k` exemplars (kc1..kc$k,
    * each one row) — prefix-stable by the greedy construction, so any
    * k is the first k stages of the same sequence. Consumes `n`.
    */
  private def kcenterStagesTo(k: Int): String = {
    val stages = (2 to k).map { i =>
      val prev = if (i == 2)
        s"""km1 AS (SELECT n.vec_id, n.e, n.nrm,
           |  1 - list_dot_product(n.e, kc1.e)/(n.nrm*kc1.nrm) AS md
           |  FROM n CROSS JOIN kc1),""".stripMargin
      else ""
      s"""${prev}kc$i AS (SELECT vec_id, e, nrm, md FROM km${i - 1}
         |  ORDER BY md DESC, vec_id ASC LIMIT 1),
         |km$i AS (SELECT m.vec_id, m.e, m.nrm,
         |  least(m.md, 1 - list_dot_product(m.e, c.e)/(m.nrm*c.nrm)) AS md
         |  FROM km${i - 1} m CROSS JOIN kc$i c)""".stripMargin
    }.mkString(",\n")
    s"""kc1 AS (SELECT vec_id, e, nrm FROM n ORDER BY vec_id LIMIT 1),
       |$stages""".stripMargin.replace("\n", " ")
  }

  /** The BPE head (mirror of [[graft.operators.TextAnalysis]]
    * `bpeVocab`): deduplicated weighted vocabulary in '¦'-separated
    * symbol representation with the '¶' end-of-word marker — ends in
    * `br0(rep, wc)`. Shared by d58 and d59. DuckDB regexp_replace
    * needs the 'g' flag and `\1` group refs where Spark is
    * global-by-default with `$1` — same output bytes.
    */
  private val bpeHeadCtes =
    """bw AS (SELECT word, CAST(count(*) AS BIGINT) AS wc
      |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) GROUP BY 1),
      |br0 AS (SELECT word, rtrim(regexp_replace(word || '¶', '(.)', '\1¦', 'g'), '¦') AS rep, wc
      |  FROM bw)""".stripMargin.replace("\n", " ")

  /** One BPE pair-count stage over representation CTE `src` — ends in
    * `$name(s1, s2, tf)`. Shared by d58 (one stage) and d59/d61
    * (chained).
    */
  private def bpeStatsCte(name: String, src: String) =
    s"""$name AS (SELECT l[i] AS s1, l[i + 1] AS s2, CAST(sum(wc) AS BIGINT) AS tf
       |  FROM (SELECT string_split(rep, '¦') AS l, wc FROM $src),
       |  LATERAL unnest(range(1, len(l))) AS t(i) GROUP BY 1, 2)""".stripMargin.replace("\n", " ")

  /** The BPE_MERGES chained stat/argmax/merge stages (mirror of
    * [[graft.operators.TextAnalysis.bpeTrain]]'s loop) — yields
    * `bm1..bmN(s1, s2, tf)` and `br1..brN(word, rep, wc)`. Shared by
    * d59 (reads the bm tables) and d61 (reads the final br).
    */
  private lazy val bpeMergeStages = (1 to BPE_MERGES).map { i =>
    s"""${bpeStatsCte(s"bs$i", s"br${i - 1}")},
       |bm$i AS (SELECT s1, s2, tf FROM bs$i ORDER BY tf DESC, s1 ASC, s2 ASC LIMIT 1),
       |br$i AS (SELECT word, replace(rep,
       |  (SELECT s1 || '¦' || s2 FROM bm$i), (SELECT s1 || s2 FROM bm$i)) AS rep, wc
       |  FROM br${i - 1})""".stripMargin
  }.mkString(",\n").replace("\n", " ")

  /** Mirror of [[graft.operators.TextAnalysis.wordPieceSegments]]'s
    * greedy walk, downstream of [[bpeHeadCtes]]+[[bpeMergeStages]]:
    * piece vocabulary (merge results ∪ alphabet), best-match-length
    * grid over every (word, position), then the walk as a recursive
    * step CTE (the grid keeps aggregation OUT of the recursion —
    * recursive terms may join but not aggregate). Ends in
    * `wfin(word, wc, n_pieces, seg)`. Shared by d137 and d138; callers
    * must open with WITH RECURSIVE.
    */
  private lazy val wordPieceCtes = {
    val mergePieces = (1 to BPE_MERGES)
      .map(i => s"SELECT s1 || s2 AS p FROM bm$i").mkString(" UNION ALL ")
    s"""wpp AS (SELECT DISTINCT p FROM ($mergePieces
       |  UNION ALL SELECT unnest(string_split(rep, '¦')) AS p FROM br0)),
       |wpw AS (SELECT word, wc, word || '¶' AS mw FROM bw),
       |wbl AS (SELECT w.mw, t.i, CAST(max(len(p.p)) AS BIGINT) AS bl
       |  FROM wpw w, LATERAL unnest(range(1, len(w.mw) + 1)) AS t(i), wpp p
       |  WHERE substr(w.mw, CAST(t.i AS INTEGER), CAST(len(p.p) AS INTEGER)) = p.p
       |  GROUP BY 1, 2),
       |wwk AS (SELECT word, mw, wc, CAST(1 AS BIGINT) AS pos,
       |    CAST(0 AS BIGINT) AS n, '' AS seg FROM wpw
       |  UNION ALL
       |  SELECT k.word, k.mw, k.wc, k.pos + b.bl, k.n + 1,
       |    k.seg || '|' || substr(k.mw, CAST(k.pos AS INTEGER), CAST(b.bl AS INTEGER))
       |  FROM wwk k JOIN wbl b ON b.mw = k.mw AND b.i = k.pos),
       |wfin AS (SELECT word, wc, n AS n_pieces, substr(seg, 2) AS seg
       |  FROM wwk WHERE pos = len(mw) + 1)""".stripMargin.replace("\n", " ")
  }

  /** Mirror of [[graft.operators.Sampling.stratified]] over the
    * language strata — ends in `u(doc_id, stratum, u)`; pair with
    * [[rateCase]] for the keep predicate. Shared by d16 and d19.
    */
  private def stratSampleCtes =
    s"""${langStrataCtes()},
       |u AS (SELECT doc_id, stratum,
       |  CAST(${duckHash60("CAST(doc_id AS VARCHAR)")} AS DOUBLE)
       |    / 1152921504606846976.0 AS u FROM l)""".stripMargin.replace("\n", " ")

  /** Language-stratum derivation (mirror of
    * [[graft.operators.TextAnalysis.langId]]'s argmax) — ends in
    * `l(doc_id, stratum[, extras])`. THE one SQL-side copy of the
    * stratum chain, shared by d16/d19 (via [[stratSampleCtes]]) and
    * d21; `extraS`/`extraL` carry additional columns through each level.
    */
  private def langStrataCtes(extraS: String = "", extraL: String = "") =
    s"""s AS (SELECT doc_id, $extraS$scSelects FROM documents),
       |l AS (SELECT doc_id, $langCase AS stratum$extraL FROM s)""".stripMargin.replace("\n", " ")

  /** The d65 UniMax waterfilling chain (mirror of
    * [[graft.operators.Curation.unimaxMixture]]'s driver loop as
    * chained per-visit stages), over the langId strata with per-doc
    * token counts riding `l`. Ends in
    * `uall(stratum, n_tokens, cap, alloc)`; shared by d65 and d82 so
    * allocation and realization cannot desynchronize.
    */
  private lazy val unimaxAllocCtes: String = {
    val stages = (1 to 4).map { i =>
      val rm = if (i == 1)
        s"urm1 AS (SELECT (SELECT CAST(sum(n_tokens) AS DOUBLE) FROM per) * $UNIMAX_BUDGET AS rem),"
      else
        s"""urm$i AS (SELECT (SELECT rem FROM urm${i - 1})
           |  - coalesce((SELECT alloc FROM ua${i - 1}), 0) AS rem),""".stripMargin
      s"""$rm
         |ua$i AS (SELECT stratum, n_tokens, cap,
         |  least(cap, (SELECT rem FROM urm$i)
         |    / CAST((SELECT n FROM unn) - ${i - 1} AS DOUBLE)) AS alloc
         |  FROM urk WHERE r = $i)""".stripMargin
    }.mkString(",\n")
    val union = (1 to 4).map(i => s"SELECT * FROM ua$i").mkString(" UNION ALL ")
    s"""${langStrataCtes("text, ",
           ", CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens")},
       |per AS (SELECT stratum, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
       |        FROM l GROUP BY 1),
       |urk AS (SELECT stratum, n_tokens,
       |  CAST(n_tokens AS DOUBLE) * $UNIMAX_EPOCHS AS cap,
       |  row_number() OVER (ORDER BY CAST(n_tokens AS DOUBLE) * $UNIMAX_EPOCHS, stratum) AS r
       |  FROM per),
       |unn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM urk),
       |$stages,
       |uall AS ($union)""".stripMargin.replace("\n", " ")
  }

  /** The SAMPLE_RATES fold as SQL (unlisted strata → default). */
  private def rateCase =
    "CASE stratum " +
      SAMPLE_RATES.map { case (s, r) => s"WHEN '$s' THEN $r" }.mkString(" ") +
      s" ELSE $SAMPLE_DEFAULT END"

  /** Shared CTEs: tokenized docs + distinct word-3-gram shingles + the
    * 60-bit hashed-shingle stream (mirror of
    * [[graft.operators.Dedup.hashedShingles]]).
    */
  private def shingleCteOver(docFilter: String) =
    s"""tok AS (SELECT doc_id, string_split(text,' ') AS w FROM documents WHERE $docFilter len(string_split(text,' ')) >= 3),
      |sh AS (SELECT DISTINCT doc_id, array_to_string(list_slice(w, i, i+2),' ') AS s
      |       FROM tok, LATERAL unnest(range(1, len(w)-1)) AS t(i)),
      |shh AS (SELECT doc_id, ${duckHash60("s")} AS hs FROM sh)""".stripMargin.replace("\n", " ")

  private val shingleCte = shingleCteOver("")

  /** THE winnowing chain (mirror of
    * [[graft.operators.Dedup.winnowFingerprints]]), ending in
    * `wsel(doc_id, pos BIGINT, fp)` — positional gram hashes (the
    * shared 60-bit construction), each window of WINNOW_W consecutive
    * grams contributing its minimal hash with rightmost tie (ORDER BY
    * h ASC, pos DESC ↔ the Scala struct-min over (h, −pos)), DISTINCT
    * selected (pos, fp) per doc. Shared by d33 and d34 so the posting
    * list and its matcher cannot desynchronize.
    */
  private lazy val winnowCtes =
    s"""tok2 AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents
       |       WHERE len(string_split(text,' ')) >= ${3 + WINNOW_W - 1}),
       |wg AS (SELECT doc_id, i, ${duckHash60("array_to_string(list_slice(tk, i, i+2),' ')")} AS h
       |      FROM tok2, LATERAL unnest(range(1, len(tk)-1)) AS t(i)),
       |wj AS (SELECT a.doc_id, a.i AS wend, b.i AS pos, b.h,
       |      row_number() OVER (PARTITION BY a.doc_id, a.i
       |        ORDER BY b.h ASC, b.i DESC) AS rn
       |      FROM wg a JOIN wg b ON b.doc_id = a.doc_id
       |        AND b.i BETWEEN a.i - ${WINNOW_W - 1} AND a.i
       |      WHERE a.i >= $WINNOW_W),
       |wsel AS (SELECT DISTINCT doc_id, CAST(pos AS BIGINT) AS pos, h AS fp
       |      FROM wj WHERE rn = 1)""".stripMargin.replace("\n", " ")

  /** The d34 pair chain (consumes [[winnowCtes]]' `wsel`): distinct
    * per-doc fingerprint sets, the boilerplate df cap, the fp
    * equi-join and the ≥ minShared filter — ends in `wpairs(doc_a,
    * doc_b, n_shared)`. Shared by d34 and d35 so the matcher and its
    * evidence stage cannot desynchronize.
    */
  private lazy val winnowPairsCtes =
    s"""fps AS (SELECT DISTINCT doc_id, fp FROM wsel),
       |healthy AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= $WINNOW_MAX_DF),
       |fpc AS (SELECT fps.* FROM fps JOIN healthy USING (fp)),
       |wpairs AS (SELECT doc_a, doc_b, n_shared FROM
       |  (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS n_shared
       |   FROM fpc x JOIN fpc y ON x.fp = y.fp AND x.doc_id < y.doc_id
       |   GROUP BY 1, 2)
       |  WHERE n_shared >= $WINNOW_MIN_SHARED)""".stripMargin.replace("\n", " ")

  /** The d36 span chain (consumes [[winnowCtes]]' `wsel` +
    * [[winnowPairsCtes]]' `wpairs`): aligned evidence, the islands
    * device per (pair, offset), gap > w+n-1 breaks — ends in
    * `wspans(doc_a, doc_b, off, start_a, end_a, n_fps)`. Shared by d36
    * and d37 so spans and the coverage signal cannot desynchronize.
    */
  private lazy val winnowSpansCtes =
    s"""wev AS (SELECT DISTINCT p.doc_a, p.doc_b, xa.pos - xb.pos AS off, xa.pos AS pos_a
       |       FROM wpairs p
       |       JOIN wsel xa ON xa.doc_id = p.doc_a
       |       JOIN wsel xb ON xb.doc_id = p.doc_b AND xb.fp = xa.fp),
       |wlg AS (SELECT *, lag(pos_a) OVER (PARTITION BY doc_a, doc_b, off ORDER BY pos_a) AS prev FROM wev),
       |wbr AS (SELECT *, CASE WHEN prev IS NULL OR pos_a - prev > ${3 + WINNOW_W - 1} THEN 1 ELSE 0 END AS brk FROM wlg),
       |wisl AS (SELECT *, sum(brk) OVER (PARTITION BY doc_a, doc_b, off ORDER BY pos_a
       |        ROWS UNBOUNDED PRECEDING) AS island FROM wbr),
       |wspans AS (SELECT doc_a, doc_b, off,
       |  CAST(min(pos_a) AS BIGINT) AS start_a,
       |  CAST(max(pos_a) + 2 AS BIGINT) AS end_a,
       |  CAST(count(*) AS BIGINT) AS n_fps
       |  FROM wisl GROUP BY doc_a, doc_b, off, island)""".stripMargin.replace("\n", " ")

  /** The ExactSubstr positional gram stream (mirror of
    * [[graft.operators.Dedup.positionalGrams]]): per OCCURRENCE, not
    * per-doc distinct — ends in `exg(doc_id, pos, hs)`. Head of every
    * ExactSubstr oracle (d40/d41/d42).
    */
  private lazy val exGramCtes = exGramCtesOver("", "TRUE")

  /** Parametric variant: gram stream over the `where`-sliced corpus,
    * CTE names suffixed — d43 instantiates it twice (history and
    * increment slices).
    */
  private def exGramCtesOver(suffix: String, where: String) =
    s"""extok$suffix AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents
       |        WHERE ($where) AND len(string_split(text,' ')) >= $EXSUB_LEN),
       |exg$suffix AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
       |        ${duckHash60(s"array_to_string(list_slice(tk, i, i+$EXSUB_LEN-1),' ')")} AS hs
       |        FROM extok$suffix, LATERAL unnest(range(1, len(tk)-$EXSUB_LEN+2)) t(i))""".stripMargin.replace("\n", " ")

  /** Remove-everywhere anchoring (d40/d41): every occurrence of a
    * dup gram anchors — ends in `exanch(doc_id, s, e)`.
    */
  private lazy val exAnchAllCtes =
    s"""exdup AS (SELECT hs FROM exg GROUP BY hs HAVING count(*) >= 2),
       |exanch AS (SELECT doc_id, pos AS s, pos + ${EXSUB_LEN - 1} AS e
       |        FROM exg JOIN exdup USING (hs))""".stripMargin.replace("\n", " ")

  /** Keep-first anchoring (d42, mirror of
    * [[graft.operators.Dedup.exactSubstrKeepFirst]]): the corpus-ordered
    * first occurrence per dup gram survives — SAME `exanch` shape so
    * both policies share the span/cut tails verbatim.
    */
  private lazy val exAnchFirstCtes =
    s"""exocc AS (SELECT *, row_number() OVER (PARTITION BY hs
       |        ORDER BY doc_id, pos) AS rn,
       |        count(*) OVER (PARTITION BY hs) AS occ FROM exg),
       |exanch AS (SELECT doc_id, pos AS s, pos + ${EXSUB_LEN - 1} AS e
       |        FROM exocc WHERE occ >= 2 AND rn > 1)""".stripMargin.replace("\n", " ")

  /** Anchor intervals → maximal merged spans (mirror of the Scala
    * `anchorsToSpans`): consumes `exanch`, ends in `exspans(doc_id,
    * start, "end", n_anchors)`.
    */
  private lazy val exSpanTailCtes =
    s"""exmg AS (SELECT *, max(e) OVER (PARTITION BY doc_id ORDER BY s, e
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme FROM exanch),
       |exbr AS (SELECT *, CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END AS brk FROM exmg),
       |exisl AS (SELECT *, sum(brk) OVER (PARTITION BY doc_id ORDER BY s, e
       |        ROWS UNBOUNDED PRECEDING) AS island FROM exbr),
       |exspans AS (SELECT doc_id, CAST(min(s) AS BIGINT) AS start,
       |  CAST(max(e) AS BIGINT) AS "end", CAST(count(*) AS BIGINT) AS n_anchors
       |  FROM exisl GROUP BY doc_id, island)""".stripMargin.replace("\n", " ")

  private lazy val exSubstrCtes = s"$exGramCtes, $exAnchAllCtes, $exSpanTailCtes"

  /** The cut tail (mirror of the Scala `cutSpans`): consumes `exanch`,
    * covered word positions anti-joined away, kept words re-joined in
    * order; fully removed docs coalesce to '' like concat_ws over an
    * empty array. The final SELECT included (no ORDER BY).
    */
  private lazy val exCutSql = exCutSqlFor("TRUE")

  /** The d43/d44 incremental chain as one statement — shared verbatim
    * by both registrations (direct history probe and persisted-index
    * probe), because their results are required to be identical.
    */
  private lazy val exSubstrIncrementalSql =
    s"""WITH ${exGramCtesOver("h", "doc_id % 4 <> 0")},
       |${exGramCtesOver("", "doc_id % 4 = 0")},
       |exhset AS (SELECT DISTINCT hs FROM exgh),
       |exanch AS (SELECT doc_id, pos AS s, pos + ${EXSUB_LEN - 1} AS e
       |        FROM exg JOIN exhset USING (hs)),
       |${exCutSqlFor("doc_id % 4 = 0")}
       |ORDER BY doc_id""".stripMargin.replace("\n", " ")

  private def exCutSqlFor(where: String) =
    s"""excov AS (SELECT DISTINCT doc_id, u.p FROM exanch,
       |          LATERAL unnest(range(s, e + 1)) u(p)),
       |extoks AS (SELECT doc_id, CAST(i AS BIGINT) AS p, tk[i] AS wtok
       |          FROM (SELECT doc_id, string_split(text,' ') AS tk FROM documents
       |                WHERE ($where)) x,
       |          LATERAL unnest(range(1, len(tk) + 1)) t(i)),
       |exnrem AS (SELECT doc_id, count(*) AS n_removed FROM excov GROUP BY doc_id),
       |exkept AS (SELECT t.doc_id, string_agg(t.wtok, ' ' ORDER BY t.p) AS clean_text
       |          FROM extoks t ANTI JOIN excov c ON c.doc_id = t.doc_id AND c.p = t.p
       |          GROUP BY t.doc_id)
       |SELECT d.doc_id, CAST(len(string_split(d.text,' ')) AS BIGINT) AS n_words,
       |  CAST(coalesce(exnrem.n_removed, 0) AS BIGINT) AS n_removed,
       |  coalesce(exkept.clean_text, '') AS clean_text
       |FROM documents d LEFT JOIN exnrem USING (doc_id)
       |LEFT JOIN exkept USING (doc_id)
       |WHERE ($where)""".stripMargin.replace("\n", " ")

  /** THE d19 verdict chain (mirror of
    * [[graft.operators.Curation.keepList]]) as one self-contained
    * SELECT (WITH RECURSIVE prefix included, no ORDER BY) — shared by
    * d19 and d38 so the verdict and its drop accounting cannot
    * desynchronize.
    */
  private lazy val curationKeepSql =
    s"""WITH RECURSIVE ${lshPairsCtes(0.5)},
       |${ccCtes("documents", "doc_id")},
       |trep AS (SELECT cluster_id, min(v) AS train_rep FROM lab
       |         WHERE v % 10 <> 0 GROUP BY cluster_id),
       |$contaminationCtes,
       |$repetitionCtes,
       |$winnowCtes,
       |$winnowPairsCtes,
       |$winnowSpansCtes,
       |sides AS (SELECT doc_a AS doc_id, start_a AS s, end_a AS e FROM wspans
       |          UNION ALL
       |          SELECT doc_b, start_a - off, end_a - off FROM wspans),
       |mg AS (SELECT *, max(e) OVER (PARTITION BY doc_id ORDER BY s, e
       |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme FROM sides),
       |br2 AS (SELECT *, CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END AS brk FROM mg),
       |is2 AS (SELECT *, sum(brk) OVER (PARTITION BY doc_id ORDER BY s, e
       |        ROWS UNBOUNDED PRECEDING) AS island FROM br2),
       |ilen AS (SELECT doc_id, island, max(e) - min(s) + 1 AS len FROM is2 GROUP BY 1, 2),
       |cov AS (SELECT doc_id, sum(len) AS n_copied FROM ilen GROUP BY 1),
       |$stratSampleCtes,
       |samp AS (SELECT doc_id, TRUE AS in_sample FROM u WHERE u < $rateCase)
       |SELECT d.doc_id,
       |  (d.doc_id = trep.train_rep) AS is_rep,
       |  NOT (coalesce(hits.n_hits, 0) > 0) AS clean,
       |  (reps.n_tokens >= 20) AS ok_len,
       |  (reps.top_ngram_frac <= 0.2 AND reps.dup_token_frac <= 0.8) AS ok_rep,
       |  (CAST(coalesce(cov.n_copied, 0) AS DOUBLE)
       |     / CAST(len(string_split(d.text, ' ')) AS DOUBLE) <= 0.5) AS ok_copy,
       |  coalesce(samp.in_sample, FALSE) AS sampled,
       |  (is_rep AND clean AND ok_len AND ok_rep AND ok_copy AND sampled) AS keep
       |FROM documents d
       |JOIN lab ON lab.v = d.doc_id
       |JOIN trep ON trep.cluster_id = lab.cluster_id
       |LEFT JOIN hits ON hits.doc_id = d.doc_id
       |JOIN reps ON reps.doc_id = d.doc_id
       |LEFT JOIN cov ON cov.doc_id = d.doc_id
       |LEFT JOIN samp ON samp.doc_id = d.doc_id
       |WHERE d.doc_id % 10 <> 0""".stripMargin.replace("\n", " ")

  /** Mirror of [[graft.operators.Dedup.dfCapped]]: shc = df-capped shh. */
  private def dfCapCte =
    s"shc AS (SELECT shh.* FROM shh JOIN (SELECT hs FROM shh GROUP BY hs HAVING count(*) <= $MAX_DF) h USING (hs))"

  /** THE d03 pair pipeline (mirror of
    * [[graft.operators.Dedup.lshNearDupPairs]]) as one CTE chain ending
    * in `pairs(a, b, jaccard)` — shared by every oracle consuming LSH
    * pair evidence (d03 itself, d12's connected components), so a
    * pipeline change cannot desynchronize them.
    */
  private def lshPairsCtes(threshold: Double) =
    s"""$shingleCte,
       |$dfCapCte,
       |mins AS (SELECT doc_id, $minhashSelect FROM shh GROUP BY doc_id),
       |sig AS (SELECT doc_id, $bandSelect FROM mins),
       |bl AS ($bandUnion),
       |blb AS (SELECT bl.* FROM bl JOIN (SELECT bno, bkey FROM bl GROUP BY bno, bkey HAVING count(*) <= $MAX_BUCKET) h USING (bno, bkey)),
       |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM blb x
       |         JOIN blb y ON x.bno = y.bno AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
       |card AS (SELECT doc_id, count(*) AS c FROM shc GROUP BY doc_id),
       |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
       |          FROM shc x JOIN shc y ON x.hs = y.hs AND x.doc_id < y.doc_id
       |          JOIN cand ON cand.a = x.doc_id AND cand.b = y.doc_id GROUP BY 1, 2),
       |pairs AS (SELECT a, b, CAST(i AS DOUBLE)/(ca.c + cb.c - i) AS jaccard
       |          FROM inter JOIN card ca ON ca.doc_id = a JOIN card cb ON cb.doc_id = b
       |          WHERE CAST(i AS DOUBLE)/(ca.c + cb.c - i) >= $threshold)""".stripMargin.replace("\n", " ")

  /** Mirror of [[graft.operators.Dedup.minhash]]: one md5 per shingle →
    * 60-bit base value mod P → k universal-hash permutations, identical
    * constants on both sides.
    */
  private def minhashSelectK(k: Int) = {
    val P = graft.operators.Dedup.HashP
    (0 until k).map { i =>
      val (a, b) = graft.operators.Dedup.hashParams(i)
      s"min(($a * (hs % $P) + $b) % $P) AS mh$i"
    }.mkString(", ")
  }
  private val minhashSelect = minhashSelectK(K)

  private val bandSelect =
    (0 until BANDS).map(b =>
      s"md5(CAST(mh${2 * b} AS VARCHAR) || '|' || CAST(mh${2 * b + 1} AS VARCHAR)) AS band$b")
      .mkString(", ")

  private val bandUnion =
    (0 until BANDS).map(b => s"SELECT doc_id, $b AS bno, band$b AS bkey FROM sig")
      .mkString(" UNION ALL ")

  // 64-bit mirror of Dedup.simhash: two md5 halves (hlo bits 0-31,
  // hhi bits 32-63); bit 63's weight is the signed Long.MinValue
  // literal, and the left-associative sum never overflows BIGINT
  // (bits 0-62 total ≤ MaxValue, then + MinValue stays in range).
  private val simhashBits =
    (0 until 64).map { j =>
      val src = if (j < 32) "hlo" else "hhi"
      s"sum(CASE WHEN ($src >> ${j % 32}) & 1 = 1 THEN 1 ELSE -1 END) AS s$j"
    }.mkString(", ")

  private val simhashSig =
    (0 until 64).map(j => s"(CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")

  private val simhashHalves =
    "('0x' || substr(md5(t),1,8))::BIGINT AS hlo, ('0x' || substr(md5(t),9,8))::BIGINT AS hhi"

  private val annBucket =
    (0 until ANN_BITS).map { j =>
      val b = 4 * j
      s"(CASE WHEN e[${b + 1}] + e[${b + 2}] - e[${b + 3}] - e[${b + 4}] > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")

  /** Shared CTE chain of the e54/e55 oracles: the nav graph (multi-probe
    * kNN edges + the mod-7919 long shortcut), the fixed entry beam, and
    * GB_ROUNDS unrolled expansion steps — each round joins the previous
    * beam to the edge set, scores ONLY fresh candidates, and cuts back
    * to GB_BEAM per query (cosine desc, vid asc — the total order the
    * Spark walk uses). Ends at CTE b{GB_ROUNDS}(qid, vid, cosine).
    */
  private def graphBeamCtes: String = graphBeamCtesWith("",
    s"SELECT vec_id, e, nrm FROM n WHERE vec_id < $GB_ENTRIES")

  /** [[graphBeamCtes]] with a parameterized ENTRY SET: `entryCtes`
    * (possibly empty, trailing-comma'd) is spliced before b0, and
    * `entrySrc` is the (vec_id, e, nrm) relation every query's initial
    * beam scores — e54/e55/e56/e57 use the fixed `vec_id <
    * GB_ENTRIES` prefix, e70 the k-center exemplar union.
    */
  private def graphBeamCtesWith(entryCtes: String, entrySrc: String): String = {
    val masks = (0L +: (0 until ANN_BITS).map(j => 1L << j)).mkString(",")
    def round(i: Int): String = {
      val prev = if (i == 1) "b0" else s"b${i - 1}"
      s"""cd$i AS (SELECT DISTINCT b.qid, eg.dst AS vid
         |  FROM $prev b JOIN eg ON eg.src = b.vid),
         |nw$i AS (SELECT c.qid, c.vid,
         |    list_dot_product(q.qe, n.e)/(q.qn*n.nrm) AS cosine
         |  FROM cd$i c JOIN n ON n.vec_id = c.vid JOIN qs q ON q.qid = c.qid
         |  WHERE NOT EXISTS (SELECT 1 FROM $prev p
         |    WHERE p.qid = c.qid AND p.vid = c.vid)),
         |b$i AS (SELECT qid, vid, cosine FROM (
         |  SELECT *, row_number() OVER (PARTITION BY qid
         |      ORDER BY cosine DESC, vid) AS rn
         |  FROM (SELECT * FROM $prev UNION ALL SELECT * FROM nw$i))
         |  WHERE rn <= $GB_BEAM)""".stripMargin.replace("\n", " ")
    }
    s"""v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm,
       |        CAST($annBucket AS BIGINT) AS bucket FROM v),
       |qp AS (SELECT vec_id, e, nrm, xor(bucket, m) AS bucket
       |      FROM n, UNNEST([$masks]) AS t(m)),
       |pp AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
       |        list_dot_product(q.e, c.e)/(q.nrm*c.nrm) AS cosine
       |      FROM qp q JOIN n c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id),
       |rr AS (SELECT *, row_number() OVER (PARTITION BY qid
       |        ORDER BY cosine DESC, nid) AS rk FROM pp),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS nv FROM v),
       |eg AS (SELECT DISTINCT src, dst FROM (
       |  SELECT qid AS src, nid AS dst FROM rr WHERE rk <= $KNN_K
       |  UNION ALL
       |  SELECT vec_id AS src, (vec_id * 7919) % nn.nv AS dst
       |  FROM v CROSS JOIN nn WHERE (vec_id * 7919) % nn.nv <> vec_id)),
       |qs AS (SELECT vec_id AS qid, e AS qe, nrm AS qn FROM n
       |       WHERE vec_id % 50 = 0),
       |${entryCtes}b0 AS (SELECT q.qid, t.vec_id AS vid,
       |    list_dot_product(q.qe, t.e)/(q.qn*t.nrm) AS cosine
       |  FROM qs q CROSS JOIN ($entrySrc) t),
       |${(1 to GB_ROUNDS).map(round).mkString(", ")}"""
      .stripMargin.replace("\n", " ")
  }

  /** The e64/e65 shared chain — mirror of Similarity.covariance plus
    * PCA_ITERS unrolled power steps: per-row outer products quantized
    * to DECIMAL(38,12) before the sum (order-independent in both
    * engines), matvecs the same way. Ends in `pv{PCA_ITERS}(j, v)`
    * with `pcov(i, j, c)` in scope.
    */
  private lazy val pcaCtes = pcaCtesOver("")

  /** The PCA covariance + power-step chain over an optionally-sliced
    * corpus — e79's snapshot oracle runs it on the history cut (the
    * as-of model must equal the one-pass chain over exactly that
    * slice); the shared val above is the full-corpus instance.
    */
  private def pcaCtesOver(where: String) = {
    def step(t: Int): String = {
      val prev = if (t == 1) "pv0" else s"pv${t - 1}"
      s"""pv$t AS (SELECT c.i AS j,
         |  CAST(sum(CAST(c.c * p.v AS DECIMAL(38,12))) AS DOUBLE) AS v
         |  FROM pcov c JOIN $prev p ON p.j = c.j GROUP BY 1)"""
        .stripMargin.replace("\n", " ")
    }
    // cov = E[xxᵀ] − μμᵀ over RAW decimal moment sums (round 13: the
    // mergeable-sufficient-statistics canonical form — mirror of
    // Similarity.spectralStats/covFromStats); pxc stays centered for
    // the debias chain's consumers
    s"""v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings $where),
       |px AS (SELECT vec_id, CAST(t.i AS INTEGER) AS i,
       |    e[CAST(t.i + 1 AS INTEGER)] AS xi
       |  FROM v, LATERAL unnest(range(0, $PQ_DIMS)) AS t(i)),
       |pmu AS (SELECT i, CAST(sum(CAST(xi AS DECIMAL(28,12))) AS DOUBLE)
       |    / count(*) AS mu FROM px GROUP BY 1),
       |pxc AS (SELECT vec_id, i, xi - mu AS xi FROM px JOIN pmu USING (i)),
       |pnn AS (SELECT CAST(count(*) AS BIGINT) AS nv FROM v),
       |psxx AS (SELECT a.i, b.i AS j,
       |    CAST(sum(CAST(a.xi * b.xi AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS sxx
       |  FROM px a JOIN px b USING (vec_id) GROUP BY 1, 2),
       |pcov AS (SELECT s.i, s.j,
       |    CAST(s.sxx AS DOUBLE) / nv - ma.mu * mb.mu AS c
       |  FROM psxx s JOIN pmu ma ON ma.i = s.i JOIN pmu mb ON mb.i = s.j
       |  CROSS JOIN pnn),
       |pv0 AS (SELECT i AS j, CASE WHEN i = 0 THEN 1.0 ELSE 0.0 END AS v
       |  FROM (SELECT DISTINCT i FROM px)),
       |${(1 to PCA_ITERS).map(step).mkString(", ")}"""
      .stripMargin.replace("\n", " ")
  }

  /** The e64 publication tail as one full statement — e64 (in-memory
    * chain) and e67 (persisted model through the sync policy) register
    * against this one text: the save→sync→load→serve round trip must
    * be bit-identical (the e41/e39 store convention).
    */
  private lazy val pcaTopSql = pcaTopSqlFor("")

  /** The e64 publication tail over an optionally-sliced corpus — e79
    * registers the AS-OF model against the history-slice instance.
    */
  private def pcaTopSqlFor(where: String) =
    s"""WITH ${pcaCtesOver(where)},
       |pmx AS (SELECT max(abs(v)) AS m FROM pv$PCA_ITERS)
       |SELECT CAST(j AS BIGINT) AS dim,
       |  CAST(CAST(v / m AS DECIMAL(28,8)) AS DOUBLE) AS pc
       |FROM pv$PCA_ITERS CROSS JOIN pmx ORDER BY dim"""
      .stripMargin.replace("\n", " ")

  /** The e66/e73 shared DEFLATION chain (consumes [[pcaCtes]]):
    * pw1 = C·pv{N}, the λ₁/‖v₁‖ normalization (scale 24 — the
    * iterate's entries are ~1e-6, PLANS_r12 #36), then PCA_ITERS
    * deflated power steps from the e₁ seed. Ends in
    * `qv{PCA_ITERS}(j, v)` with `pw1`, `pu1` in scope.
    */
  private lazy val pcaDeflCtes = {
    def qstep(t: Int): String = {
      val prev = if (t == 1) "qv0" else s"qv${t - 1}"
      s"""qw$t AS (SELECT c.i AS j,
         |  CAST(sum(CAST(c.c * p.v AS DECIMAL(38,12))) AS DOUBLE) AS w
         |  FROM pcov c JOIN $prev p ON p.j = c.j GROUP BY 1),
         |qs$t AS (SELECT CAST(sum(CAST(u.u * p.v AS DECIMAL(38,12))) AS DOUBLE) AS s
         |  FROM pu1 u JOIN $prev p USING (j)),
         |qv$t AS (SELECT w.j, w.w - u.lam * qs$t.s * u.u AS v
         |  FROM qw$t w JOIN pu1 u USING (j) CROSS JOIN qs$t)"""
        .stripMargin.replace("\n", " ")
    }
    s"""pw1 AS (SELECT c.i AS j,
       |  CAST(sum(CAST(c.c * p.v AS DECIMAL(38,12))) AS DOUBLE) AS w
       |  FROM pcov c JOIN pv$PCA_ITERS p ON p.j = c.j GROUP BY 1),
       |psc AS (SELECT
       |  CAST(sum(CAST(v.v * w.w AS DECIMAL(38,24))) AS DOUBLE) /
       |  CAST(sum(CAST(v.v * v.v AS DECIMAL(38,24))) AS DOUBLE) AS lam,
       |  sqrt(CAST(sum(CAST(v.v * v.v AS DECIMAL(38,24))) AS DOUBLE)) AS nrm
       |  FROM pv$PCA_ITERS v JOIN pw1 w USING (j)),
       |pu1 AS (SELECT j, v / nrm AS u, lam FROM pv$PCA_ITERS CROSS JOIN psc),
       |qv0 AS (SELECT i AS j, CASE WHEN i = 1 THEN 1.0 ELSE 0.0 END AS v
       |  FROM (SELECT DISTINCT i FROM px)),
       |${(1 to PCA_ITERS).map(qstep).mkString(", ")}"""
      .stripMargin.replace("\n", " ")
  }

  /** The e68/e69 shared debias chain (consumes [[pcaCtes]]'s pxc and
    * pv{N}): v̂₁ = iterate/‖iterate‖ (the e66 normalization formula),
    * per-vector projection coefficient as `list_dot_product` over the
    * dim-ordered lists — the SEQUENTIAL double fold in array order,
    * replaying the Spark side's codegen'd ArrayDotProduct bit-for-bit
    * (the e01 cosine device) — re-encoded components
    * xp = (x−μ) − d·v̂₁. Ends in `pxp(vec_id, dim, xp)`.
    */
  private lazy val pcaDebiasCtes =
    s"""pnr AS (SELECT sqrt(CAST(sum(CAST(v * v AS DECIMAL(38,24))) AS DOUBLE)) AS nrm
       |  FROM pv$PCA_ITERS),
       |pu1 AS (SELECT j, v / nrm AS u FROM pv$PCA_ITERS CROSS JOIN pnr),
       |pul AS (SELECT list(u ORDER BY j) AS ul FROM pu1),
       |pcvl AS (SELECT vec_id, list(xi ORDER BY i) AS cvl FROM pxc GROUP BY vec_id),
       |pdot AS (SELECT vec_id, list_dot_product(cvl, ul) AS d
       |  FROM pcvl CROSS JOIN pul),
       |pxp AS (SELECT x.vec_id, x.i AS dim, x.xi - pd.d * u.u AS xp
       |  FROM pxc x JOIN pu1 u ON u.j = x.i
       |  JOIN pdot pd ON pd.vec_id = x.vec_id)"""
      .stripMargin.replace("\n", " ")

  /** The e62/e63 shared chain: JL reduced vectors (sign literals from
    * the SAME Scala table as the Spark side), reduced-space shortlist,
    * exact full-space rerank — ends in `rrk(query_id, neighbor_id,
    * cosine, rk)` with `n` (full-space normalized) in scope for the
    * recall tail.
    */
  private lazy val jlRerankCtes = {
    val signs = graft.operators.Similarity.jlSigns(JL_M, PQ_DIMS)
    val rlist = (0 until JL_M).map { i =>
      val l = signs(i).map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")
      s"list_dot_product(e, $l)"
    }.mkString("[", ", ", "]")
    s"""v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |rv AS (SELECT vec_id, $rlist AS e FROM v),
       |jn AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM rv),
       |jp AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    list_dot_product(q.e, c.e)/(q.nrm*c.nrm) AS cosine
       |  FROM jn q JOIN jn c ON q.vec_id % 50 = 0 AND c.vec_id <> q.vec_id),
       |rsh AS (SELECT query_id, neighbor_id FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, neighbor_id) AS rk FROM jp)
       |  WHERE rk <= $RERANK_SHORTLIST),
       |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
       |rrk AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, neighbor_id) AS rk FROM (
       |  SELECT s.query_id, s.neighbor_id,
       |    list_dot_product(q.e, c.e)/(q.nrm*c.nrm) AS cosine
       |  FROM rsh s JOIN n q ON q.vec_id = s.query_id
       |    JOIN n c ON c.vec_id = s.neighbor_id))"""
      .stripMargin.replace("\n", " ")
  }

  /** The plain rectangle filter the z-ordered store must reproduce —
    * d145 (fresh build) and d146 (history + append) register against
    * this one text (the store convention).
    */
  private lazy val zRectSql =
    s"""SELECT event_id, user_id, epoch_us(ts) * 1000 AS ts,
       |  user_id % ${1L << Z_BITS} AS ux,
       |  (epoch_us(ts)//3600000000) % ${1L << Z_BITS} AS ty
       |FROM events
       |WHERE user_id % ${1L << Z_BITS} BETWEEN ${Z_UX._1} AND ${Z_UX._2}
       |  AND (epoch_us(ts)//3600000000) % ${1L << Z_BITS} BETWEEN ${Z_TY._1} AND ${Z_TY._2}
       |ORDER BY event_id""".stripMargin.replace("\n", " ")

  /** The d61 store convention for the graph family: e54 (in-memory
    * graph) and e57 (persisted edges) register against this one text.
    */
  private lazy val graphBeamSql =
    s"""WITH $graphBeamCtes
       |SELECT query_id, rk, neighbor_id, cosine FROM (
       |  SELECT qid AS query_id,
       |    CAST(row_number() OVER (PARTITION BY qid
       |      ORDER BY cosine DESC, vid) AS BIGINT) AS rk,
       |    vid AS neighbor_id, cosine
       |  FROM b$GB_ROUNDS WHERE vid <> qid)
       |WHERE rk <= $GB_K ORDER BY query_id, rk"""
      .stripMargin.replace("\n", " ")

  /** The e54 final-beam top-k as a named CTE over b`rounds` (self
    * excluded, rank by cosine desc / id asc) — shared by the e55
    * recall row and every e56 curve point.
    */
  private def beamFoundCte(name: String, rounds: Int): String =
    s"""$name AS (SELECT query_id, neighbor_id FROM (
       |  SELECT qid AS query_id,
       |    row_number() OVER (PARTITION BY qid
       |      ORDER BY cosine DESC, vid) AS rk,
       |    vid AS neighbor_id
       |  FROM b$rounds WHERE vid <> qid) WHERE rk <= $GB_K)"""
      .stripMargin.replace("\n", " ")

  /** The brute-force exact top-k baseline + query count (`ex`, `nqr`)
    * the graph-walk recall rows compare against. Shared by e55/e56.
    */
  private val beamExactCtes =
    s"""exp AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
       |    list_dot_product(q.e, c.e)/(q.nrm*c.nrm) AS cosine
       |  FROM n q JOIN n c ON q.vec_id % 50 = 0 AND c.vec_id <> q.vec_id),
       |ex AS (SELECT query_id, neighbor_id FROM (
       |  SELECT qid AS query_id, nid AS neighbor_id,
       |    row_number() OVER (PARTITION BY qid
       |      ORDER BY cosine DESC, nid) AS rk FROM exp) WHERE rk <= $GB_K),
       |nqr AS (SELECT CAST(count(DISTINCT query_id) AS BIGINT) AS n_queries
       |  FROM ex)""".stripMargin.replace("\n", " ")

  private def markerIn(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ",", ")")

  private val scSelects = TextAnalysis.markers.map { case (l, ws) =>
    s"len(list_filter(string_split(text,' '), x -> x IN ${markerIn(ws)})) AS sc_$l"
  }.mkString(", ")

  private val langCase = {
    val langs = TextAnalysis.markers.map(_._1)
    val whens = langs.init.zipWithIndex.map { case (l, i) =>
      val conds = langs.drop(i + 1).map(o => s"sc_$l >= sc_$o").mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }.mkString(" ")
    s"CASE $whens ELSE '${langs.last}' END"
  }

  def oracles: Map[String, String] = Map(
    // mirror of Multimodal.frameSample: range(0, n, S) ≡ Spark's
    // sequence(0, n-1, S); digest of per-frame md5 hexes. DuckDB has no
    // BLOB substring/slice, so the oracle samples in the VARCHAR
    // domain — exact only while the corpus is pure ASCII (char
    // positions == byte positions, md5(varchar) == md5 of the bytes),
    // and that precondition is ENFORCED in-query: any non-ASCII doc
    // makes the oracle error() loudly instead of producing a silently
    // divergent digest. The Spark side stays byte-true regardless.
    "m03_frame_sample" ->
      s"""WITH f AS (SELECT doc_id, text,
         |  CAST(octet_length(encode(text)) // $FRAME_BYTES AS BIGINT) AS n_frames FROM documents),
         |chk AS (SELECT count(*) AS bad FROM documents WHERE octet_length(encode(text)) <> length(text))
         |SELECT doc_id, n_frames,
         | CAST((n_frames + ${FRAME_STRIDE - 1}) // $FRAME_STRIDE AS BIGINT) AS n_sampled,
         | CASE WHEN (SELECT bad FROM chk) > 0
         |      THEN error('m03 oracle precondition violated: corpus is not pure ASCII')
         |      ELSE md5(CASE WHEN n_frames > 0
         |        THEN array_to_string(list_transform(range(0, n_frames, $FRAME_STRIDE),
         |               k -> md5(substring(text, CAST(k * $FRAME_BYTES + 1 AS INT), $FRAME_BYTES))), '')
         |        ELSE '' END) END AS sample_digest
         |FROM f ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // mirror of Multimodal.mediaPhash in the VARCHAR domain (duckPhash
    // doc) with the m03 ASCII guard folded into the integer output
    "m05_media_phash" ->
      s"""WITH p AS (SELECT doc_id, ${duckPhash("text")} AS phash FROM documents)
         |SELECT doc_id, phash + ${asciiGuard("m05")} AS phash
         |FROM p ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // mirror of Multimodal.mediaNearDupPairs over documents + the
    // single-byte-corrupted twins: the same banded Hamming join in the
    // VARCHAR domain, multi-block matches collapsed by min()
    "m06_media_neardup" -> {
      val nb = SIMHASH_RADIUS + 1
      val bits = 60 / nb
      val mask = (1L << bits) - 1
      s"""WITH med AS (SELECT doc_id, text AS t FROM documents
         |  UNION ALL SELECT doc_id + 1000000, 'Z' || substring(text, 2, length(text) - 1)
         |  FROM documents WHERE doc_id % 2 = 0),
         |p AS (SELECT doc_id, ${duckPhash("t")} AS phash FROM med),
         |blk AS (SELECT doc_id, phash, b AS bpos,
         |  CAST((phash >> CAST(b * $bits AS INT)) & $mask AS BIGINT) AS bval
         |  FROM p, LATERAL unnest(range(0, $nb)) AS u(b)),
         |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  bit_count(xor(a.phash, b.phash)) AS hamming
         |  FROM blk a JOIN blk b ON a.bpos = b.bpos AND a.bval = b.bval AND a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.phash, b.phash)) <= $SIMHASH_RADIUS)
         |SELECT doc_a, doc_b, CAST(min(hamming) AS BIGINT) + ${asciiGuard("m06")} AS hamming
         |FROM pr GROUP BY doc_a, doc_b ORDER BY doc_a, doc_b""".stripMargin.replace("\n", " ")
    },

    // mirror of Multimodal.savePhashIndex + mediaNearDupIndexed: the
    // m06 pigeonhole join with history swapped for the index table;
    // m09 = the sync round trip serving the same verdicts (append ≡
    // rebuild — fingerprints are parameter-derived)
    "m08_phash_indexed" -> phashIndexedSql,
    "m09_phash_synced" -> phashIndexedSql,

    // mirror of the m12 snapshot probe: the m08 chain with the index
    // side cut to version 1's watermark (the 3/4 cut of media history)
    "m12_phash_time_travel" -> phashIndexedSqlFor(
      "doc_id % 4 <> 0 AND doc_id <= (SELECT CAST(max(doc_id) * 3 // 4 AS BIGINT) FROM documents WHERE doc_id % 4 <> 0)"),

    // mirror of Dedup.lineDedup over documents + exact twins: the same
    // keep-first window partitioned by line text, docs rebuilt with an
    // ordered filtered string_agg (NULL -> '' on the emptied twins)
    "d63_line_dedup" ->
      s"""WITH med AS (SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 2 = 0),
         |l AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, ls[i] AS line
         |  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM med),
         |  LATERAL unnest(range(1, len(ls) + 1)) AS t(i)),
         |k AS (SELECT doc_id, pos, line,
         |  (row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) = 1) AS keep_line FROM l)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
         |  CAST(sum(CASE WHEN keep_line THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
         |  coalesce(string_agg(line, chr(10) ORDER BY pos) FILTER (WHERE keep_line), '') AS text_out
         |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // mirror of Dedup.contaminationFrac: the d13 shape at n=8 with
    // per-doc totals, frac as one double division, short docs frac 0
    "d67_contamination_frac" ->
      s"""WITH tok8 AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
         |  WHERE len(string_split(text, ' ')) >= $CONTAM_N),
         |sh8 AS (SELECT DISTINCT doc_id,
         |  array_to_string(list_slice(w, i, i + ${CONTAM_N - 1}), ' ') AS s
         |  FROM tok8, LATERAL unnest(range(1, len(w) - ${CONTAM_N - 2})) AS t(i)),
         |shh8 AS (SELECT doc_id, ${duckHash60("s")} AS hs FROM sh8),
         |ev8 AS (SELECT DISTINCT hs FROM shh8 WHERE doc_id % 10 = 0),
         |tr8 AS (SELECT doc_id, hs FROM shh8 WHERE doc_id % 10 <> 0),
         |tot8 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM tr8 GROUP BY 1),
         |hit8 AS (SELECT tr8.doc_id, CAST(count(*) AS BIGINT) AS n_hits
         |  FROM tr8 JOIN ev8 USING (hs) GROUP BY 1)
         |SELECT *, (overlap_frac >= $CONTAM_FRAC) AS contaminated FROM (
         |  SELECT d.doc_id,
         |    CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams,
         |    CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
         |    CASE WHEN coalesce(n_grams, 0) > 0
         |         THEN CAST(coalesce(n_hits, 0) AS DOUBLE) / n_grams ELSE 0.0 END AS overlap_frac
         |  FROM (SELECT doc_id FROM documents WHERE doc_id % 10 <> 0) d
         |  LEFT JOIN tot8 USING (doc_id) LEFT JOIN hit8 USING (doc_id))
         |ORDER BY doc_id""".stripMargin.replace("\n", " "),

    "d01_exact_dedup" ->
      """SELECT sha256(text) AS digest, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY digest""".stripMargin.replace("\n", " "),

    "d02_minhash_bands" ->
      s"""WITH $shingleCte,
         |mins AS (SELECT doc_id, $minhashSelect FROM shh GROUP BY doc_id)
         |SELECT doc_id, $bandSelect FROM mins ORDER BY doc_id""".stripMargin.replace("\n", " "),

    "d03_lsh_pairs" ->
      s"""WITH ${lshPairsCtes(0.5)}
         |SELECT a AS doc_a, b AS doc_b, jaccard FROM pairs
         |ORDER BY doc_a, doc_b""".stripMargin.replace("\n", " "),

    // mirror of Dedup.tripletMine over the shared LSH pair chain:
    // symmetrized pairs, per-anchor argmax, hash60 negative draw with
    // the two-step collision walk
    "d123_triplet_mine" ->
      s"""WITH ${lshPairsCtes(0.5)},
         |sym AS (SELECT a AS anchor, b AS p, jaccard FROM pairs
         |        UNION ALL SELECT b, a, jaccard FROM pairs),
         |best AS (SELECT anchor, p, jaccard FROM
         |  (SELECT *, row_number() OVER (PARTITION BY anchor
         |     ORDER BY jaccard DESC, p) AS rn FROM sym) WHERE rn = 1),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         |hx AS (SELECT anchor, p, jaccard, n_docs,
         |  ${duckHash60("'neg:' || CAST(anchor AS VARCHAR)")} % n_docs AS h
         |  FROM best CROSS JOIN nn)
         |SELECT anchor, p AS positive, jaccard AS jaccard_pos,
         |  CAST(CASE WHEN h <> anchor AND h <> p THEN h
         |    WHEN (h + 1) % n_docs <> anchor AND (h + 1) % n_docs <> p
         |      THEN (h + 1) % n_docs
         |    ELSE (h + 2) % n_docs END AS BIGINT) AS negative
         |FROM hx ORDER BY anchor""".stripMargin.replace("\n", " "),

    // mirror of Dedup.tripletMineHard: the d123 election plus e06's
    // bucketed knn chain, near-dups excluded by anti-join, per-anchor
    // argmax cosine
    "d125_hard_negatives" ->
      s"""WITH ${lshPairsCtes(0.5)},
         |sym AS (SELECT a AS anchor, b AS p, jaccard FROM pairs
         |        UNION ALL SELECT b, a, jaccard FROM pairs),
         |best AS (SELECT anchor, p, jaccard FROM
         |  (SELECT *, row_number() OVER (PARTITION BY anchor
         |     ORDER BY jaccard DESC, p) AS rn FROM sym) WHERE rn = 1),
         |v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm,
         |        CAST($annBucket AS BIGINT) AS bucket FROM v),
         |kp AS (SELECT q.vec_id AS qid, c.vec_id AS neighbor_id,
         |        list_dot_product(q.e, c.e)/(q.nrm*c.nrm) AS cosine
         |      FROM n q JOIN n c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id),
         |kr AS (SELECT *, CAST(row_number() OVER (PARTITION BY qid
         |    ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rk FROM kp),
         |knn AS (SELECT qid, neighbor_id, cosine FROM kr WHERE rk <= $KNN_K),
         |nd AS (SELECT k.* FROM knn k WHERE NOT EXISTS
         |  (SELECT 1 FROM sym s WHERE s.anchor = k.qid AND s.p = k.neighbor_id)),
         |hb AS (SELECT qid, neighbor_id, cosine FROM
         |  (SELECT *, row_number() OVER (PARTITION BY qid
         |     ORDER BY cosine DESC, neighbor_id) AS hrn FROM nd) WHERE hrn = 1)
         |SELECT anchor, p AS positive, jaccard AS jaccard_pos,
         |  CAST(hb.neighbor_id AS BIGINT) AS hard_negative,
         |  hb.cosine AS neg_cosine
         |FROM best LEFT JOIN hb ON hb.qid = best.anchor
         |ORDER BY anchor""".stripMargin.replace("\n", " "),

    // mirror of Dedup.minhashEstPairs over the shared estimation chain
    "d27_minhash_est" ->
      s"""WITH $minhashEstCtes
         |SELECT a AS doc_a, b AS doc_b, est_jaccard FROM est
         |ORDER BY doc_a, doc_b""".stripMargin.replace("\n", " "),

    // mirror of Dedup.minhashAgreement: the sliced estimation chain
    // beside the sliced exact chain (threshold 0 — the honest
    // denominator), full-outer-joined with a status column
    "d52_minhash_agreement" ->
      s"""WITH ${minhashEstCtesOver("doc_id % 2 = 0 AND")},
         |$dfCapCte,
         |card AS (SELECT doc_id, count(*) AS c FROM shc GROUP BY doc_id),
         |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
         |          FROM shc x JOIN shc y ON x.hs = y.hs AND x.doc_id < y.doc_id GROUP BY 1, 2),
         |exact AS (SELECT a, b, CAST(i AS DOUBLE)/(ca.c + cb.c - i) AS jaccard
         |          FROM inter JOIN card ca ON ca.doc_id = a JOIN card cb ON cb.doc_id = b)
         |SELECT coalesce(e.a, s.a) AS doc_a, coalesce(e.b, s.b) AS doc_b,
         |  e.jaccard, s.est_jaccard,
         |  CASE WHEN e.a IS NULL THEN 'est_only'
         |       WHEN s.a IS NULL THEN 'exact_only' ELSE 'both' END AS status
         |FROM exact e FULL OUTER JOIN est s ON e.a = s.a AND e.b = s.b
         |ORDER BY doc_a, doc_b""".stripMargin.replace("\n", " "),

    // mirror of Dedup.minhashKnnGraph: the same estimation chain,
    // symmetrized, top-k per vertex by (estimate DESC, neighbor ASC)
    "d29_lexical_knn" ->
      s"""WITH $minhashEstCtes,
         |sym AS (SELECT a AS doc_id, b AS neighbor_id, est_jaccard FROM est
         |        UNION ALL
         |        SELECT b AS doc_id, a AS neighbor_id, est_jaccard FROM est),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
         |        ORDER BY est_jaccard DESC, neighbor_id ASC) AS BIGINT) AS rk FROM sym)
         |SELECT doc_id, rk, neighbor_id, est_jaccard FROM r WHERE rk <= $LEX_KNN_K
         |ORDER BY doc_id, rk""".stripMargin.replace("\n", " "),

    // the d12/d13/d14/d16 oracle fragments (the SAME shared builders
    // those oracles consume) joined into the one keep verdict; shh from
    // the shared pair chain feeds the contamination split too, so every
    // stage reads the same shingle stream. trep picks the TRAIN-side
    // representative per cluster: clustering spans the whole corpus so
    // eval near-dups still collapse train docs, but an eval-anchored
    // component min must not drop clean train content.
    "d19_curation_keep" ->
      s"$curationKeepSql ORDER BY d.doc_id",

    // the curation run's operational dashboard: one row of per-reason
    // drop accounting over d19's verdict (mirror of
    // Curation.keepSummary) — a broken gate shows up as a count jump
    "d38_keep_summary" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_train,
         |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
         |  CAST(sum(CASE WHEN NOT is_rep THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
         |  CAST(sum(CASE WHEN NOT clean THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
         |  CAST(sum(CASE WHEN NOT ok_len THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
         |  CAST(sum(CASE WHEN NOT ok_rep THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive,
         |  CAST(sum(CASE WHEN NOT ok_copy THEN 1 ELSE 0 END) AS BIGINT) AS n_copied,
         |  CAST(sum(CASE WHEN NOT sampled THEN 1 ELSE 0 END) AS BIGINT) AS n_unsampled
         |FROM ($curationKeepSql) t""".stripMargin.replace("\n", " "),

    // per-doc distinct grams upstream (shingle CTE) make df ≥ 2 exactly
    // "another doc has the span"; LEFT JOIN reinstates gram-less docs
    "d18_dup_spans" ->
      s"""WITH $shingleCte,
         |dfq AS (SELECT hs, count(*) AS df FROM shh GROUP BY hs),
         |per AS (SELECT doc_id, count(*) AS n_grams,
         |        sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS n_shared
         |        FROM shh JOIN dfq USING (hs) GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(n_grams, 0) AS n_grams,
         |       coalesce(CAST(n_shared AS DOUBLE) / n_grams, 0.0) AS dup_span_frac
         |FROM documents d LEFT JOIN per USING (doc_id) ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // per-shard running sums mirror the Window.rowsBetween(-∞, -1) form;
    // the sum is CAST back to BIGINT (DuckDB window sums widen to
    // HUGEINT) so schemas align
    "d20_pack_plan" ->
      s"""WITH t AS (SELECT doc_id, ${duckHash60("CAST(doc_id AS VARCHAR)")} % $PACK_SHARDS AS shard,
         |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens FROM documents),
         |w AS (SELECT doc_id, shard, n_tokens,
         |  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off FROM t)
         |SELECT doc_id, shard, n_tokens, start_off,
         |  CAST(start_off // $PACK_SEQLEN AS BIGINT) AS seq_idx
         |FROM w ORDER BY doc_id""".stripMargin.replace("\n", " "),

    "d21_mixture_stats" ->
      s"""WITH ${langStrataCtes("text, ",
             ", CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens")},
         |per AS (SELECT stratum, count(*) AS n_docs,
         |        CAST(sum(n_tokens) AS BIGINT) AS n_tokens FROM l GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens FROM per)
         |SELECT stratum, n_docs, n_tokens,
         |  CAST(n_tokens AS DOUBLE)/tot_tokens AS token_share
         |FROM per CROSS JOIN tot ORDER BY stratum""".stripMargin.replace("\n", " "),

    // mirror of Curation.unimaxMixture: the d21 stats head, caps ranked
    // ascending, then one chained stage per visit — each stage's
    // remaining subtracts the PREVIOUS alloc (same sequential
    // association as the driver fold), divisor = strata left
    "d65_unimax" ->
      s"""WITH $unimaxAllocCtes
         |SELECT stratum, n_tokens, cap AS cap_tokens, alloc AS alloc_tokens,
         |  alloc / CAST(n_tokens AS DOUBLE) AS epochs
         |FROM uall ORDER BY stratum""".stripMargin.replace("\n", " "),

    // mirror of Curation.unimaxSelect: the d65 waterfilling chain for
    // the allocations, then the d47 prefix sum run PER STRATUM
    // ((stratum, bkt)-partitioned running sums + per-stratum bucket
    // offsets); selected = stratum-local start strictly below the
    // stratum's allocation
    "d82_unimax_select" ->
      s"""WITH $unimaxAllocCtes,
         |ub AS (SELECT doc_id, stratum, n_tokens,
         |  ${duckHash60("CAST(doc_id AS VARCHAR)")} AS k FROM l),
         |ubb AS (SELECT *, k >> 52 AS bkt FROM ub),
         |uwc AS (SELECT *, sum(n_tokens) OVER (PARTITION BY stratum, bkt ORDER BY k, doc_id) AS cum FROM ubb),
         |ubo AS (SELECT stratum, bkt,
         |  CAST(sum(bt) OVER (PARTITION BY stratum ORDER BY bkt) - bt AS BIGINT) AS off
         |  FROM (SELECT stratum, bkt, sum(n_tokens) AS bt FROM ubb GROUP BY 1, 2)),
         |ups AS (SELECT doc_id, stratum, n_tokens,
         |  CAST(off + cum - n_tokens AS BIGINT) AS start_tok
         |  FROM uwc JOIN ubo USING (stratum, bkt)),
         |ual AS (SELECT stratum, alloc FROM uall)
         |SELECT doc_id, ups.stratum, n_tokens, start_tok,
         |  (CAST(start_tok AS DOUBLE) < alloc) AS selected
         |FROM ups JOIN ual ON ual.stratum = ups.stratum
         |ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // expression order/parenthesization mirrors TextAnalysis.bm25
    // exactly (every op is +,-,*,/ over doubles — bit-identical)
    "d17_bm25" -> bm25Sql,

    // d159 shares d17's oracle VERBATIM: appended postings + exact
    // integer constant merges must serve the rebuilt corpus's scores
    // bit-for-bit
    "d159_bm25_appended" -> bm25Sql,

    // mirror of the d160 as-of serve: the d17 chain over the history
    // slice — version 1's constants, dfs, lengths, and candidate docs
    // all come from exactly that corpus cut
    "d160_bm25_time_travel" ->
      s"""WITH bhist AS (SELECT * FROM documents
         |  WHERE doc_id <= (SELECT CAST(max(doc_id) * 3 // 4 AS BIGINT) FROM documents)),
         |${bm25CtesFor(BM25_TERMS, "q", "bhist")}
         |SELECT doc_id, score FROM qsc ORDER BY doc_id"""
        .stripMargin.replace("\n", " "),

    // d87: the persisted inverted index must not change a score —
    // d17's oracle verbatim (the d44/e31 persistence-equality claim)
    "d87_bm25_indexed" -> bm25Sql,

    // d90 serves the SAME scores from the bucket-partitioned layout —
    // the layout must be invisible to the ranking function
    "d90_bm25_bucketed" -> bm25Sql,

    // mirror of packedContexts: the d48 span chain re-joined to the
    // tokenized text, segments sliced at doc_offset, in-window order by
    // ctx_offset, md5 over the space-rejoined window payload
    "d92_pack_content" ->
      s"""WITH $tokenOffsetCtes,
         |pctx AS (SELECT doc_id, n_tokens, start_token,
         |  unnest(range(start_token // $CTX_LEN,
         |               (start_token + n_tokens - 1) // $CTX_LEN + 1)) AS ctx_id
         |  FROM pos),
         |pspan AS (SELECT doc_id, CAST(ctx_id AS BIGINT) AS ctx_id,
         |  CAST(greatest(start_token, ctx_id * $CTX_LEN) - ctx_id * $CTX_LEN AS BIGINT) AS ctx_offset,
         |  CAST(greatest(start_token, ctx_id * $CTX_LEN) - start_token AS BIGINT) AS doc_offset,
         |  CAST(least(start_token + n_tokens, (ctx_id + 1) * $CTX_LEN)
         |       - greatest(start_token, ctx_id * $CTX_LEN) AS BIGINT) AS len
         |  FROM pctx),
         |pw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |pseg AS (SELECT s.ctx_id, s.ctx_offset, s.len,
         |  array_to_string(list_slice(pw.w, s.doc_offset + 1, s.doc_offset + s.len), ' ') AS seg
         |  FROM pspan s JOIN pw USING (doc_id))
         |SELECT ctx_id, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(len) AS BIGINT) AS n_tokens,
         |  md5(string_agg(seg, ' ' ORDER BY ctx_offset)) AS content_digest
         |FROM pseg GROUP BY ctx_id ORDER BY ctx_id"""
        .stripMargin.replace("\n", " "),

    // mirror of fullVerdictSummary over the shared d85 CTE bundle
    "d93_verdict_summary" ->
      s"""WITH $fullCurationCtes,
         |fvz AS (SELECT ck.keep AS curation_keep, tser.tier,
         |  csel.selected AS cls_keep,
         |  (ck.keep AND tser.tier <> 'tail' AND csel.selected) AS selected
         |  FROM ck JOIN tser ON tser.doc_id = ck.doc_id
         |  JOIN csel ON csel.doc_id = ck.doc_id)
         |SELECT CAST(count(*) AS BIGINT) AS n_train,
         |  CAST(sum(CASE WHEN curation_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_curation_keep,
         |  CAST(sum(CASE WHEN tier = 'head' THEN 1 ELSE 0 END) AS BIGINT) AS n_head,
         |  CAST(sum(CASE WHEN tier = 'middle' THEN 1 ELSE 0 END) AS BIGINT) AS n_middle,
         |  CAST(sum(CASE WHEN tier = 'tail' THEN 1 ELSE 0 END) AS BIGINT) AS n_tail,
         |  CAST(sum(CASE WHEN cls_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_cls_keep,
         |  CAST(sum(CASE WHEN selected THEN 1 ELSE 0 END) AS BIGINT) AS n_selected
         |FROM fvz""".stripMargin.replace("\n", " "),

    // mirror of bm25TopKAll: the d17 chain restricted to docs where
    // every query term's tf is positive (the intersection), same
    // (score DESC, doc_id) cut and rank
    "d94_bm25_topk_all" -> {
      val allPresent = BM25_TERMS.indices
        .map(i => s"d.tf$i > 0").mkString(" AND ")
      s"""WITH ${bm25CtesFor(BM25_TERMS, "j")}
         |SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rk,
         |  doc_id, score
         |FROM (SELECT s.doc_id, s.score FROM jsc s JOIN jd d ON d.doc_id = s.doc_id
         |      WHERE $allPresent
         |      ORDER BY s.score DESC, s.doc_id LIMIT $BM25_TOPK)
         |ORDER BY rk""".stripMargin.replace("\n", " ")
    },

    // mirror of Sampling.epochShuffle: per-epoch hash60("<epoch>:<id>")
    // key, one row_number per epoch (the oracle can afford the global
    // window the Spark side replaces with the bucketed rank device),
    // round-robin shard from the contiguous rank
    "d95_epoch_shuffle" ->
      s"""WITH se AS (SELECT doc_id, CAST(ep AS BIGINT) AS epoch,
         |  ${duckHash60("CAST(ep AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)")} AS k
         |  FROM documents CROSS JOIN (SELECT range AS ep FROM range(0, $EPOCHS))),
         |sr AS (SELECT epoch, doc_id,
         |  CAST(row_number() OVER (PARTITION BY epoch ORDER BY k, doc_id) AS BIGINT) AS rk
         |  FROM se)
         |SELECT epoch, doc_id, rk, CAST((rk - 1) % $LOADER_SHARDS AS BIGINT) AS shard
         |FROM sr ORDER BY epoch, rk""".stripMargin.replace("\n", " "),

    // mirror of Sampling.hashSplit: the SAME BigDecimal-derived integer
    // cutoffs (Sampling.splitCuts) injected as literals — the CASE
    // chain is generated from one cut table on both engines
    "d96_hash_split" -> {
      val cuts = Sampling.splitCuts(SPLIT_FRACS)
      val cases = cuts.init
        .map { case (nm, c) => s"WHEN h < $c THEN '$nm'" }.mkString(" ")
      s"""SELECT doc_id, CASE $cases ELSE '${cuts.last._1}' END AS split
         |FROM (SELECT doc_id,
         |  ${duckHash60(s"'$SPLIT_SALT:' || CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin.replace("\n", " ")
    },

    // mirror of Sampling.systematicResample: the shared d47 prefix-sum
    // chain, total W from its own tail, integer midpoint probes, and
    // the containment join the Spark side bin-buckets
    "d97_systematic_resample" ->
      s"""WITH $tokenOffsetCtes,
         |stot AS (SELECT CAST(max(start_token + n_tokens) AS BIGINT) AS w FROM pos),
         |spts AS (SELECT CAST(range AS BIGINT) AS sample_id,
         |  ((CAST(range AS BIGINT) * 2 + 1) * w) // ${2L * RESAMPLE_N} AS point
         |  FROM range(0, $RESAMPLE_N) CROSS JOIN stot)
         |SELECT sample_id, point, doc_id, n_tokens FROM spts JOIN pos
         |  ON point >= start_token AND point < start_token + n_tokens
         |ORDER BY sample_id""".stripMargin.replace("\n", " "),

    // mirror of Multimodal.captionAlign: the m05 fingerprint on both
    // sides, matched + successor-control pairs, agree-bit similarity
    "m10_caption_align" ->
      s"""WITH cp AS (SELECT doc_id, ${duckPhash("text")} AS phash FROM documents),
         |cpr AS (SELECT doc_id, phash, doc_id AS cap_doc_id FROM cp
         |  UNION ALL SELECT doc_id, phash, doc_id + 1 FROM cp),
         |csc AS (SELECT pr.doc_id, pr.cap_doc_id,
         |  CAST(60 - bit_count(xor(pr.phash, c.phash)) AS BIGINT) AS agree_bits
         |  FROM cpr pr JOIN cp c ON c.doc_id = pr.cap_doc_id)
         |SELECT doc_id, cap_doc_id, agree_bits + ${asciiGuard("m10")} AS agree_bits,
         |  CAST(agree_bits AS DOUBLE) / 60 AS align,
         |  CAST(agree_bits AS DOUBLE) / 60 >= $CAPTION_T AS keep
         |FROM csc ORDER BY doc_id, cap_doc_id""".stripMargin.replace("\n", " "),

    // mirror of Unigram.tokenizerCompare: the d61 BPE encode chain and
    // the d102 unigram chain over the same corpus, one fertility row
    "d103_tokenizer_compare" ->
      s"""WITH RECURSIVE $bpeHeadCtes, $bpeMergeStages,
         |benc AS (SELECT word, CAST(len(string_split(rep, '¦')) AS BIGINT) AS n_syms
         |  FROM br$BPE_MERGES),
         |btok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
         |bagg AS (SELECT CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(n_syms) AS BIGINT) AS n_tokens_bpe
         |  FROM btok JOIN benc USING (word)),
         |${uniChainCtes(UNI_EM)},
         |${uniSegCtes(UNI_EM + 1, s"um$UNI_EM")},
         |uagg AS (SELECT CAST(sum(np) AS BIGINT) AS n_pieces_uni
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) t
         |  JOIN bw${UNI_EM + 1} b USING (word))
         |SELECT n_words, n_tokens_bpe, n_pieces_uni,
         |  CAST(n_tokens_bpe AS DOUBLE) / n_words AS bpe_fertility,
         |  CAST(n_pieces_uni AS DOUBLE) / n_words AS uni_fertility
         |FROM bagg CROSS JOIN uagg""".stripMargin.replace("\n", " "),

    // mirror of Unigram.unigramTrain: the full-enumeration fixed point
    // (uniChainCtes doc) — final model after UNI_EM hard-EM rounds
    "d101_unigram_train" ->
      s"""WITH RECURSIVE ${uniChainCtes(UNI_EM)}
         |SELECT piece, cnt, CAST(nll AS DOUBLE) AS nll FROM um$UNI_EM
         |ORDER BY piece""".stripMargin.replace("\n", " "),

    // mirror of Unigram.unigramEncode: one more full-enumeration
    // segmentation under the final model, joined onto the token stream
    "d102_unigram_encode" -> uniEncodeSql,

    // d104 serves the SAME segmentation from the persisted store —
    // registered against d102's oracle verbatim (persistence must not
    // change a segmentation)
    "d104_unigram_indexed" -> uniEncodeSql,

    // mirror of TextAnalysis.suffixArray: each doc's suffixes
    // MATERIALIZED as space-joined strings and sorted — the O(n²)
    // independent construction the prefix-doubling DP must reproduce
    // (space < every ascii letter makes word-wise order = string
    // order; ascii guard enforces the precondition)
    "d105_suffix_array" ->
      s"""WITH st AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |sfx AS (SELECT doc_id, CAST(t.i AS BIGINT) AS pos,
         |  array_to_string(w[CAST(t.i + 1 AS INTEGER):], ' ') AS suf
         |  FROM st, LATERAL unnest(range(0, len(w))) AS t(i))
         |SELECT doc_id, pos,
         |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY suf) AS BIGINT)
         |    + ${asciiGuard("d105")} AS rnk
         |FROM sfx ORDER BY doc_id, pos""".stripMargin.replace("\n", " "),

    // mirror of TextAnalysis.suffixLcp: adjacent pairs of the d105
    // sorted order compared ELEMENTWISE as word arrays — first-false
    // position of the equality vector is the LCP (list_position yields
    // 0, not NULL, on a clean vector: the nullif(…, 0) catches the
    // all-equal case, where LCP = the shorter length)
    "d106_suffix_lcp" -> sfxLcpSqlOver("TRUE"),

    // d114/d115 serve the per-doc LCP array through append / sync
    // round trips — same oracle text as d106 (store maintenance must
    // not change a single row)
    "d114_suffix_appended" -> sfxLcpSqlOver("doc_id % 4 = 0"),
    "d115_suffix_sync" -> sfxLcpSqlOver("doc_id % 4 = 0"),

    // mirror of TextAnalysis.globalSuffixArray: ONE dense_rank over
    // every materialized suffix string of every doc
    "d108_global_suffix_array" ->
      s"""WITH st AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |sfx AS (SELECT doc_id, CAST(t.i AS BIGINT) AS pos,
         |  array_to_string(w[CAST(t.i + 1 AS INTEGER):], ' ') AS suf
         |  FROM st, LATERAL unnest(range(0, len(w))) AS t(i))
         |SELECT doc_id, pos,
         |  CAST(dense_rank() OVER (ORDER BY suf) AS BIGINT)
         |    + ${asciiGuard("d108")} AS rnk
         |FROM sfx ORDER BY doc_id, pos""".stripMargin.replace("\n", " "),

    // mirror of TextAnalysis.globalSuffixLcp: dense suffix classes,
    // adjacent classes' word arrays compared elementwise (the d106
    // nullif(list_position, 0) device), class occurrence/doc counts
    "d109_global_suffix_lcp" ->
      s"""WITH st AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |sfx AS (SELECT doc_id, CAST(t.i AS BIGINT) AS pos,
         |  array_to_string(w[CAST(t.i + 1 AS INTEGER):], ' ') AS suf
         |  FROM st, LATERAL unnest(range(0, len(w))) AS t(i)),
         |rk AS (SELECT doc_id, suf,
         |  CAST(dense_rank() OVER (ORDER BY suf) AS BIGINT) AS r FROM sfx),
         |cls AS (SELECT r, min(suf) AS s, count(*) AS n_occ,
         |  count(DISTINCT doc_id) AS n_docs FROM rk GROUP BY r),
         |adj AS (SELECT a.r, string_split(a.s, ' ') AS sa,
         |  string_split(b.s, ' ') AS sb, a.n_occ, a.n_docs
         |  FROM cls a JOIN cls b ON b.r = a.r - 1)
         |SELECT r AS rnk,
         |  coalesce(nullif(list_position(
         |      list_transform(range(1, least(len(sa), len(sb)) + 1), i -> sa[i] = sb[i]),
         |      false), 0) - 1,
         |    CAST(least(len(sa), len(sb)) AS BIGINT)) + ${asciiGuard("d109")} AS lcp,
         |  n_occ, n_docs
         |FROM adj ORDER BY rnk""".stripMargin.replace("\n", " "),

    // mirror of TextAnalysis.crossDocRepeat: rule (a) = whole classes
    // shared by >= 2 docs, rule (b) = adjacent-class LCPs where the
    // other side holds a different doc; per-doc max, 0 default
    "d110_crossdoc_repeat" ->
      s"""WITH st AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |sfx AS (SELECT doc_id, CAST(t.i AS BIGINT) AS pos,
         |  array_to_string(w[CAST(t.i + 1 AS INTEGER):], ' ') AS suf
         |  FROM st, LATERAL unnest(range(0, len(w))) AS t(i)),
         |rk AS (SELECT doc_id, suf,
         |  CAST(dense_rank() OVER (ORDER BY suf) AS BIGINT) AS r FROM sfx),
         |cls AS (SELECT r, min(suf) AS s FROM rk GROUP BY r),
         |clen AS (SELECT r, CAST(len(string_split(s, ' ')) AS BIGINT) AS l FROM cls),
         |dpc AS (SELECT DISTINCT r, doc_id FROM rk),
         |stats AS (SELECT r, count(*) AS nd, min(doc_id) AS mn FROM dpc GROUP BY r),
         |lcps AS (SELECT a.r,
         |  coalesce(nullif(list_position(
         |      list_transform(range(1, least(len(string_split(a.s, ' ')), len(string_split(b.s, ' '))) + 1),
         |        i -> string_split(a.s, ' ')[i] = string_split(b.s, ' ')[i]),
         |      false), 0) - 1,
         |    CAST(least(len(string_split(a.s, ' ')), len(string_split(b.s, ' '))) AS BIGINT)) AS l
         |  FROM cls a JOIN cls b ON b.r = a.r - 1),
         |cand AS (
         |  SELECT dpc.doc_id, clen.l AS v FROM dpc
         |    JOIN stats USING (r) JOIN clen USING (r) WHERE stats.nd >= 2
         |  UNION ALL
         |  SELECT dpc.doc_id, lcps.l AS v FROM dpc
         |    JOIN lcps ON lcps.r = dpc.r + 1
         |    JOIN stats s2 ON s2.r = lcps.r
         |    WHERE s2.nd >= 2 OR s2.mn <> dpc.doc_id
         |  UNION ALL
         |  SELECT dpc.doc_id, lcps.l AS v FROM dpc
         |    JOIN lcps ON lcps.r = dpc.r
         |    JOIN stats s2 ON s2.r = lcps.r - 1
         |    WHERE s2.nd >= 2 OR s2.mn <> dpc.doc_id),
         |mx AS (SELECT doc_id, max(v) AS m FROM cand GROUP BY doc_id)
         |SELECT d.doc_id,
         |  coalesce(mx.m, 0) + ${asciiGuard("d110")} AS max_shared_words,
         |  coalesce(mx.m, 0) < $CROSS_CONTAM AS keep
         |FROM documents d LEFT JOIN mx ON d.doc_id = mx.doc_id
         |ORDER BY d.doc_id""".stripMargin.replace("\n", " "),

    // mirror of TextAnalysis.longestRepeat: per-doc max over the d106
    // LCP values, 0 for single-suffix docs, keep = under the cut
    "d107_longest_repeat" ->
      s"""WITH st AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |sfx AS (SELECT doc_id, CAST(t.i AS BIGINT) AS pos,
         |  w[CAST(t.i + 1 AS INTEGER):] AS sl,
         |  array_to_string(w[CAST(t.i + 1 AS INTEGER):], ' ') AS suf
         |  FROM st, LATERAL unnest(range(0, len(w))) AS t(i)),
         |rnk AS (SELECT doc_id, pos, sl,
         |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY suf) AS BIGINT) AS rnk
         |  FROM sfx),
         |adj AS (SELECT a.doc_id, a.sl AS sa, b.sl AS sb
         |  FROM rnk a JOIN rnk b ON a.doc_id = b.doc_id AND b.rnk = a.rnk - 1),
         |lcp AS (SELECT doc_id,
         |  coalesce(nullif(list_position(
         |      list_transform(range(1, least(len(sa), len(sb)) + 1), i -> sa[i] = sb[i]),
         |      false), 0) - 1,
         |    CAST(least(len(sa), len(sb)) AS BIGINT)) AS l
         |  FROM adj),
         |mx AS (SELECT doc_id, max(l) AS mx FROM lcp GROUP BY doc_id)
         |SELECT d.doc_id,
         |  coalesce(mx.mx, 0) + ${asciiGuard("d107")} AS max_dup_words,
         |  coalesce(mx.mx, 0) < $LREP_MAX AS keep
         |FROM documents d LEFT JOIN mx ON d.doc_id = mx.doc_id
         |ORDER BY d.doc_id""".stripMargin.replace("\n", " "),

    // mirror of TextAnalysis.zipfSlope: top-k frequency cut, ln ranks/
    // counts at DECIMAL(18,8), moment sums exact (products at (36,16)),
    // slope as the identical fixed double tree
    "d98_zipf_slope" -> {
      val lnrk = "CAST(ln(CAST(rk AS DOUBLE)) AS DECIMAL(18,8))"
      val lnc = "CAST(ln(CAST(c AS DOUBLE)) AS DECIMAL(18,8))"
      s"""WITH zw AS (SELECT word, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
         |  GROUP BY 1 ORDER BY c DESC, word LIMIT $ZIPF_K),
         |zr AS (SELECT c, CAST(row_number() OVER (ORDER BY c DESC, word) AS BIGINT) AS rk FROM zw),
         |zm AS (SELECT CAST(count(*) AS BIGINT) AS n_words,
         |  sum($lnrk) AS sx, sum($lnc) AS sy,
         |  sum($lnrk * $lnc) AS sxy, sum($lnrk * $lnrk) AS sxx FROM zr)
         |SELECT n_words, slope, -slope AS alpha FROM (SELECT n_words,
         |  (n_words * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         |  / (n_words * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope
         |  FROM zm)""".stripMargin.replace("\n", " ")
    },

    // mirror of TextAnalysis.countMinEstimate: the depth×width counter
    // grid from the same hash60("<r>:<term>") buckets, min-over-rows
    // estimate, truth joined with a zero default
    "d99_countmin" -> {
      val vals = CMS_TERMS.map(t => s"('$t')").mkString(", ")
      val inList = CMS_TERMS.map(t => s"'$t'").mkString(", ")
      val hb = duckHash60("CAST(r AS VARCHAR) || ':' || term")
      s"""WITH ct AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
         |cexp AS (SELECT rr.range AS r, term FROM ct CROSS JOIN range(0, $CMS_DEPTH) rr),
         |cs AS (SELECT r, $hb % $CMS_WIDTH AS bucket,
         |  CAST(count(*) AS BIGINT) AS c FROM cexp GROUP BY 1, 2),
         |qt AS (SELECT term, rr.range AS r
         |  FROM (VALUES $vals) q(term) CROSS JOIN range(0, $CMS_DEPTH) rr),
         |qb AS (SELECT term, r, $hb % $CMS_WIDTH AS bucket FROM qt),
         |est AS (SELECT term, CAST(min(coalesce(c, 0)) AS BIGINT) AS est
         |  FROM qb LEFT JOIN cs USING (r, bucket) GROUP BY 1),
         |tc AS (SELECT term, CAST(count(*) AS BIGINT) AS true_cnt
         |  FROM ct WHERE term IN ($inList) GROUP BY 1)
         |SELECT term, est, coalesce(true_cnt, CAST(0 AS BIGINT)) AS true_cnt
         |FROM est LEFT JOIN tc USING (term) ORDER BY term"""
        .stripMargin.replace("\n", " ")
    },

    // mirror of TextAnalysis.phraseSearchIndexed: 0-based positions
    // from the split array, adjacency as the same (doc_id, pos+i)
    // equi-join chain, per-doc match count + first occurrence
    "d100_phrase_search" -> {
      val joins = PHRASE.indices.tail.map { i =>
        s"JOIN pp a$i ON a$i.doc_id = a0.doc_id AND a$i.pos = a0.pos + $i" +
          s" AND a$i.term = '${PHRASE(i)}'"
      }.mkString(" ")
      s"""WITH pp AS (SELECT doc_id, CAST(t.i AS BIGINT) AS pos, w[t.i + 1] AS term
         |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |  LATERAL unnest(range(0, len(w))) AS t(i)),
         |m AS (SELECT a0.doc_id, a0.pos FROM pp a0 $joins
         |  WHERE a0.term = '${PHRASE.head}')
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches,
         |  CAST(min(pos) AS BIGINT) AS first_pos
         |FROM m GROUP BY 1 ORDER BY doc_id""".stripMargin.replace("\n", " ")
    },

    // mirror of curatedShardsSync's grown store: the d51 two-stage
    // placement (history chain frozen, increment offset by the history
    // total) with BOTH chains restricted to the selected subset
    "d91_curated_sync" ->
      s"""WITH cutv AS (SELECT CAST(max(doc_id) * 3 // 4 AS BIGINT) AS cut FROM documents),
         |${tokenOffsetCtesFor("h",
            "WHERE doc_id <= (SELECT cut FROM cutv) AND doc_id % 3 = 0")},
         |htot AS (SELECT CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS base FROM hb),
         |${tokenOffsetCtesFor("i",
            "WHERE doc_id > (SELECT cut FROM cutv) AND doc_id % 3 = 0")},
         |allpos AS (SELECT doc_id, n_tokens, start_token FROM hos
         |  UNION ALL SELECT doc_id, n_tokens, start_token + base AS start_token
         |  FROM ios CROSS JOIN htot)
         |SELECT doc_id, n_tokens, start_token,
         |  CAST(start_token // $SHARD_BUDGET AS BIGINT) AS shard_id
         |FROM allpos ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // mirror of TextAnalysis.bm25TopKIndexed: one d17-chain instance per
    // retrieval query (prefixed CTEs), the same (score DESC, doc_id) cut
    // and rank — brute-force scoring against the index's top-k plan
    "d89_bm25_topk" -> {
      val chains = BM25_QUERIES.zipWithIndex
        .map { case (terms, qi) => bm25CtesFor(terms, s"k$qi") }.mkString(", ")
      val arms = BM25_QUERIES.indices.map { qi =>
        s"""SELECT CAST($qi AS BIGINT) AS query_id,
           |  CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rk,
           |  doc_id, score
           |FROM (SELECT doc_id, score FROM k${qi}sc
           |      ORDER BY score DESC, doc_id LIMIT $BM25_TOPK)""".stripMargin
      }.mkString(" UNION ALL ")
      s"""WITH $chains
         |SELECT * FROM ($arms) ORDER BY query_id, rk"""
        .stripMargin.replace("\n", " ")
    },

    "d15_vocab" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(text,' ')) AS token FROM documents),
        |c AS (SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df FROM tk GROUP BY 1)
        |SELECT CAST(row_number() OVER (ORDER BY tf DESC, token) AS BIGINT) AS rank, token, tf, df
        |FROM c ORDER BY tf DESC, token LIMIT 100""".stripMargin.replace("\n", " "),

    // mirror of TextAnalysis.redactPii: the same three RE2/Java-portable
    // patterns in the same order; 'g' makes DuckDB replace-all like Spark
    "d32_pii_redact" -> {
      val em = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
      val url = "https?://[^\\s]+"
      val num = "[0-9]{7,}"
      s"""WITH s1 AS (SELECT doc_id,
         |  len(regexp_extract_all(text, '$em')) AS ne,
         |  regexp_replace(text, '$em', '<EMAIL>', 'g') AS t1 FROM documents),
         |s2 AS (SELECT doc_id, ne,
         |  len(regexp_extract_all(t1, '$url')) AS nu,
         |  regexp_replace(t1, '$url', '<URL>', 'g') AS t2 FROM s1),
         |s3 AS (SELECT doc_id, ne, nu,
         |  len(regexp_extract_all(t2, '$num')) AS nd,
         |  regexp_replace(t2, '$num', '<NUM>', 'g') AS t3 FROM s2)
         |SELECT doc_id, t3 AS redacted, CAST(ne + nu + nd AS BIGINT) AS n_redacted
         |FROM s3 ORDER BY doc_id""".stripMargin.replace("\n", " ")
    },

    // mirror of Dedup.winnowFingerprints over the shared winnowing
    // chain (winnowCtes doc)
    "d33_winnow_fp" ->
      s"""WITH $winnowCtes
         |SELECT doc_id, pos, fp FROM wsel ORDER BY doc_id, pos""".stripMargin.replace("\n", " "),

    // mirror of Dedup.winnowCopyPairs over the shared pair chain
    // (winnowPairsCtes doc) — d33's matcher the way d03 is d02's
    "d34_winnow_pairs" ->
      s"""WITH $winnowCtes,
         |$winnowPairsCtes
         |SELECT doc_a, doc_b, CAST(n_shared AS BIGINT) AS n_shared
         |FROM wpairs ORDER BY doc_a, doc_b""".stripMargin.replace("\n", " "),

    // mirror of Dedup.winnowMatchEvidence: the shared pair chain, then
    // each shared fingerprint re-joined with its position in BOTH
    // documents — the aligned copied-span evidence (d03→d04-style
    // verify over d34's candidates)
    "d35_winnow_evidence" ->
      s"""WITH $winnowCtes,
         |$winnowPairsCtes,
         |ev AS (SELECT p.doc_a, p.doc_b, xa.fp, xa.pos AS pos_a, xb.pos AS pos_b
         |       FROM wpairs p
         |       JOIN wsel xa ON xa.doc_id = p.doc_a
         |       JOIN wsel xb ON xb.doc_id = p.doc_b AND xb.fp = xa.fp)
         |SELECT doc_a, doc_b, fp, pos_a, pos_b FROM ev
         |ORDER BY doc_a, doc_b, fp, pos_a, pos_b""".stripMargin.replace("\n", " "),

    // mirror of Dedup.winnowCopySpans over the shared span chain
    // (winnowSpansCtes doc)
    "d36_winnow_spans" ->
      s"""WITH $winnowCtes,
         |$winnowPairsCtes,
         |$winnowSpansCtes
         |SELECT doc_a, doc_b, off AS "offset", start_a,
         |  CAST(start_a - off AS BIGINT) AS start_b, end_a, n_fps
         |FROM wspans
         |ORDER BY doc_a, doc_b, off, start_a""".stripMargin.replace("\n", " "),

    // mirror of Dedup.winnowMergedExtents: wspans interval-merged per
    // (doc_a, doc_b) across offsets by the islands device
    "d39_winnow_extents" ->
      s"""WITH $winnowCtes,
         |$winnowPairsCtes,
         |$winnowSpansCtes,
         |pmg AS (SELECT *, max(end_a) OVER (PARTITION BY doc_a, doc_b
         |        ORDER BY start_a, end_a
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme FROM wspans),
         |pbr AS (SELECT *, CASE WHEN pme IS NULL OR start_a > pme THEN 1 ELSE 0 END AS brk FROM pmg),
         |pisl AS (SELECT *, sum(brk) OVER (PARTITION BY doc_a, doc_b
         |        ORDER BY start_a, end_a ROWS UNBOUNDED PRECEDING) AS island FROM pbr)
         |SELECT doc_a, doc_b, CAST(min(start_a) AS BIGINT) AS start_a,
         |  CAST(max(end_a) AS BIGINT) AS end_a,
         |  CAST(count(*) AS BIGINT) AS n_spans,
         |  CAST(sum(n_fps) AS BIGINT) AS n_fps
         |FROM pisl GROUP BY doc_a, doc_b, island
         |ORDER BY doc_a, doc_b, start_a""".stripMargin.replace("\n", " "),

    // mirror of TextAnalysis.bigramLm over the shared LM chain
    // (bigramLmCtes doc)
    "d45_bigram_lm" ->
      s"""WITH $bigramLmCtes
         |SELECT doc_id, n_bigrams, avg_nll FROM lm
         |ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // mirror of TextAnalysis.kneserNeyLm: the d45 gram/count CTEs plus
    // continuation counts; P is a ratio of two exact BIGINTs, nll
    // rounded once to DECIMAL(28,8) (the shared d45 device)
    "d136_kneser_ney_lm" ->
      """WITH lt AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |lg AS (SELECT doc_id, unnest(list_slice(w, 1, len(w)-1)) AS prev,
        |        unnest(list_slice(w, 2, len(w))) AS cur FROM lt WHERE len(w) >= 2),
        |lc2 AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS c2 FROM lg GROUP BY 1, 2),
        |lc1 AS (SELECT prev, CAST(sum(c2) AS BIGINT) AS c1,
        |        CAST(count(*) AS BIGINT) AS n1p FROM lc2 GROUP BY 1),
        |ln1r AS (SELECT cur, CAST(count(*) AS BIGINT) AS n1r FROM lc2 GROUP BY 1),
        |lb AS (SELECT CAST(count(*) AS BIGINT) AS b FROM lc2),
        |lmodel AS (SELECT prev, cur,
        |  CAST(ln(CAST(4 * c1 * b AS DOUBLE) /
        |    CAST((4 * c2 - 3) * b + 3 * n1p * n1r AS DOUBLE)) AS DECIMAL(28,8)) AS nll
        |  FROM lc2 JOIN lc1 USING (prev) JOIN ln1r USING (cur) CROSS JOIN lb),
        |lm AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(nll) AS DOUBLE) / count(*) AS avg_nll
        |  FROM lg JOIN lmodel USING (prev, cur) GROUP BY doc_id)
        |SELECT doc_id, n_bigrams, avg_nll FROM lm
        |ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // mirror of TextAnalysis.pmiCollocations: the d45 gram CTEs,
    // contingency-table marginals, ln of exact-integer ratios rounded
    // once, top-k by the ROUNDED pmi
    "d141_pmi_collocations" ->
      s"""WITH lt AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
         |lg AS (SELECT doc_id, unnest(list_slice(w, 1, len(w)-1)) AS prev,
         |        unnest(list_slice(w, 2, len(w))) AS cur FROM lt WHERE len(w) >= 2),
         |lc2 AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS c2 FROM lg GROUP BY 1, 2),
         |prm AS (SELECT prev, CAST(sum(c2) AS BIGINT) AS rm FROM lc2 GROUP BY 1),
         |pcm AS (SELECT cur, CAST(sum(c2) AS BIGINT) AS cm FROM lc2 GROUP BY 1),
         |ptt AS (SELECT CAST(sum(c2) AS BIGINT) AS t FROM lc2),
         |psc AS (SELECT prev, cur, c2,
         |  CAST(CAST(ln(CAST(c2 * t AS DOUBLE) / CAST(rm * cm AS DOUBLE)) AS DECIMAL(28,8)) AS DOUBLE) AS pmi,
         |  CAST((c2 - $PMI_DELTA) * t AS DOUBLE) / CAST(rm * cm AS DOUBLE) AS phrase_score
         |  FROM lc2 JOIN prm USING (prev) JOIN pcm USING (cur) CROSS JOIN ptt
         |  WHERE c2 >= $PMI_MIN)
         |SELECT CAST(row_number() OVER (ORDER BY pmi DESC, prev, cur) AS BIGINT) AS rank,
         |  prev, cur, c2, pmi, phrase_score
         |FROM (SELECT * FROM psc ORDER BY pmi DESC, prev, cur LIMIT $PMI_K)
         |ORDER BY rank""".stripMargin.replace("\n", " "),

    // mirror of TextAnalysis.blocklistFilter: token-level IN over the
    // lowercased split
    "d143_blocklist" -> {
      val inList = BLOCK_WORDS.map(w => s"'$w'").mkString("(", ",", ")")
      s"""SELECT doc_id,
         |  CAST(len(list_filter(string_split(lower(text),' '), x -> x IN $inList)) AS BIGINT) AS n_hits,
         |  len(list_filter(string_split(lower(text),' '), x -> x IN $inList)) = 0 AS keep
         |FROM documents ORDER BY doc_id""".stripMargin.replace("\n", " ")
    },

    // mirror of ZOrder.eventGrid: the SAME Scala loop renders both
    // engines' interleave expression (zKeySql)
    "d144_zorder_key" ->
      s"""SELECT event_id, ux, ty, CAST(${ZOrder.zKeySql("ux", "ty", Z_BITS)} AS BIGINT) AS zkey
         |FROM (SELECT event_id, user_id % ${1L << Z_BITS} AS ux,
         |  (epoch_us(ts)//3600000000) % ${1L << Z_BITS} AS ty
         |  FROM events WHERE event_id % 100 = 0)
         |ORDER BY event_id""".stripMargin.replace("\n", " "),

    // append ≡ rebuild (static bucket function): d146 answers the same
    // rectangle over the grown store — d145's oracle text verbatim
    "d146_zorder_appended" -> zRectSql,

    // the store must not change the answer: d145's oracle is the plain
    // rectangle filter over the raw table
    "d145_zorder_query" -> zRectSql,

    // mirror of ZOrder.zRectQueryAt: the snapshot read must equal the
    // plain rectangle over the HISTORY half — the id cut is version 1's
    // watermark (the store's 3/4 build cut)
    "d153_zorder_time_travel" ->
      s"""SELECT event_id, user_id, epoch_us(ts) * 1000 AS ts,
         |  user_id % ${1L << Z_BITS} AS ux,
         |  (epoch_us(ts)//3600000000) % ${1L << Z_BITS} AS ty
         |FROM events
         |WHERE user_id % ${1L << Z_BITS} BETWEEN ${Z_UX._1} AND ${Z_UX._2}
         |  AND (epoch_us(ts)//3600000000) % ${1L << Z_BITS} BETWEEN ${Z_TY._1} AND ${Z_TY._2}
         |  AND event_id <= (SELECT (max(event_id) * 3) // 4 FROM events)
         |ORDER BY event_id""".stripMargin.replace("\n", " "),

    // mirror of TextAnalysis.charEntropy: per-position characters,
    // counts, per-char ln rounded once, decimal sum, one divide + one
    // subtract
    "d142_char_entropy" ->
      """WITH ech AS (SELECT doc_id, substr(text, CAST(i AS INTEGER), 1) AS ch
        |  FROM documents, LATERAL unnest(range(1, length(text) + 1)) AS t(i)),
        |ecc AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c FROM ech GROUP BY 1, 2),
        |eag AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars,
        |  CAST(count(*) AS BIGINT) AS n_distinct_chars,
        |  sum(CAST(CAST(c AS DECIMAL(19,0)) *
        |    CAST(ln(CAST(c AS DOUBLE)) AS DECIMAL(18,8)) AS DECIMAL(38,8))) AS s
        |  FROM ecc GROUP BY 1)
        |SELECT doc_id, n_chars, n_distinct_chars,
        |  CAST(CAST(ln(CAST(n_chars AS DOUBLE)) AS DECIMAL(28,8)) AS DOUBLE)
        |    - CAST(s AS DOUBLE) / n_chars AS entropy
        |FROM eag ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // mirror of TextAnalysis.perplexityTiers: the distributed
    // global-rank device over the shared LM chain — bucket-partitioned
    // row_numbers plus per-bucket base offsets, terciles on the rank
    "d46_ppl_tiers" ->
      s"""WITH $bigramLmCtes,
         |ls AS (SELECT doc_id, avg_nll,
         |       CAST(floor(avg_nll * $LM_SCALE) AS BIGINT) AS bkt FROM lm),
         |lbc AS (SELECT bkt, CAST(count(*) AS BIGINT) AS bc FROM ls GROUP BY 1),
         |lbo AS (SELECT bkt, CAST(sum(bc) OVER (ORDER BY bkt) - bc AS BIGINT) AS off FROM lbc),
         |ltot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM lm),
         |lrk AS (SELECT doc_id, avg_nll,
         |  CAST(off + row_number() OVER (PARTITION BY bkt ORDER BY avg_nll, doc_id) AS BIGINT) AS rnk
         |  FROM ls JOIN lbo USING (bkt))
         |SELECT doc_id, avg_nll, rnk,
         |  CASE WHEN (rnk - 1) * 3 < n_total THEN 'head'
         |       WHEN (rnk - 1) * 3 < 2 * n_total THEN 'middle'
         |       ELSE 'tail' END AS tier
         |FROM lrk CROSS JOIN ltot ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // mirror of Packing.curriculumShards: the d46 tier chain LEFT
    // JOINed to the corpus (short docs -> tail), the composite
    // (tier_idx << 60) + hash60 key through the same prefix-sum shape
    // at a 62-bit grid (k >> 54)
    "d62_curriculum_shards" ->
      s"""WITH $bigramLmCtes,
         |ls AS (SELECT doc_id, avg_nll,
         |       CAST(floor(avg_nll * $LM_SCALE) AS BIGINT) AS bkt FROM lm),
         |lbc AS (SELECT bkt, CAST(count(*) AS BIGINT) AS bc FROM ls GROUP BY 1),
         |lbo AS (SELECT bkt, CAST(sum(bc) OVER (ORDER BY bkt) - bc AS BIGINT) AS off FROM lbc),
         |ltot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM lm),
         |lrk AS (SELECT doc_id,
         |  CAST(off + row_number() OVER (PARTITION BY bkt ORDER BY avg_nll, doc_id) AS BIGINT) AS rnk
         |  FROM ls JOIN lbo USING (bkt)),
         |ltr AS (SELECT doc_id,
         |  CASE WHEN (rnk - 1) * 3 < n_total THEN 'head'
         |       WHEN (rnk - 1) * 3 < 2 * n_total THEN 'middle'
         |       ELSE 'tail' END AS tier
         |  FROM lrk CROSS JOIN ltot),
         |cb AS (SELECT d.doc_id, coalesce(t.tier, 'tail') AS tier,
         |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
         |  CAST(CASE coalesce(t.tier, 'tail') WHEN 'head' THEN 0
         |       WHEN 'middle' THEN 1 ELSE 2 END AS BIGINT) * 1152921504606846976
         |    + ${duckHash60("CAST(d.doc_id AS VARCHAR)")} AS k
         |  FROM documents d LEFT JOIN ltr t ON t.doc_id = d.doc_id),
         |cbb AS (SELECT *, k >> 54 AS bkt FROM cb),
         |cwc AS (SELECT *, sum(n_tokens) OVER (PARTITION BY bkt ORDER BY k, doc_id) AS cum FROM cbb),
         |cbo AS (SELECT bkt, CAST(sum(bt) OVER (ORDER BY bkt) - bt AS BIGINT) AS boff
         |        FROM (SELECT bkt, sum(n_tokens) AS bt FROM cbb GROUP BY 1)),
         |cos_ AS (SELECT doc_id, tier, n_tokens,
         |         CAST(boff + cum - n_tokens AS BIGINT) AS start_token
         |        FROM cwc JOIN cbo USING (bkt))
         |SELECT doc_id, tier, n_tokens, start_token,
         |  CAST(start_token // $SHARD_BUDGET AS BIGINT) AS shard_id
         |FROM cos_ ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // mirror of Packing.tokenShards over the shared prefix-sum chain
    // (tokenOffsetCtes doc)
    "d47_token_shards" ->
      s"""WITH $tokenOffsetCtes
         |SELECT doc_id, n_tokens, start_token,
         |  CAST(start_token // $SHARD_BUDGET AS BIGINT) AS shard_id
         |FROM pos ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // mirror of Packing.pairPack: one plain row_number over
    // (len DESC, doc_id) — the bucketed device's semantics — and a
    // self-join on the mirrored rank
    "d121_pair_pack" ->
      s"""WITH ${pairPackCtes("documents")}
         |$pairPackSelect ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // the loader capstone (d135): the d19 keep verdict's survivors
    // fold-packed — selection CTE feeding the d121 placement chain
    "d135_loader_capstone" ->
      s"""WITH kd AS (SELECT d.doc_id, d.text FROM documents d
         |  JOIN ($curationKeepSql) k ON d.doc_id = k.doc_id AND k.keep),
         |${pairPackCtes("kd")}
         |$pairPackSelect ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // mirror of Packing.packEfficiency: the d121 bins aggregated, plus
    // the closed-form singleton and concat bills
    "d122_pack_efficiency" ->
      s"""WITH l AS (SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |r AS (SELECT doc_id, n_tokens,
         |    CAST(row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS BIGINT) AS rnk,
         |    CAST(count(*) OVER () AS BIGINT) AS n_total FROM l),
         |j AS (SELECT a.doc_id, a.n_tokens, a.rnk,
         |    a.n_total + 1 - a.rnk AS prnk, b.n_tokens AS p_tokens
         |  FROM r a JOIN r b ON b.rnk = a.n_total + 1 - a.rnk),
         |bins AS (SELECT CASE WHEN rnk <> prnk AND n_tokens + p_tokens <= $PAIR_CTX
         |    THEN least(rnk, prnk) ELSE rnk END AS bin_id,
         |    sum(n_tokens) AS fill FROM j GROUP BY 1),
         |pr AS (SELECT 'paired' AS strategy, CAST(count(*) AS BIGINT) AS n_bins,
         |    CAST(sum(greatest(0, $PAIR_CTX - fill)) AS BIGINT) AS pad_tokens FROM bins),
         |sg AS (SELECT 'singleton' AS strategy, CAST(count(*) AS BIGINT) AS n_bins,
         |    CAST(sum(greatest(0, $PAIR_CTX - n_tokens)) AS BIGINT) AS pad_tokens FROM l),
         |cc AS (SELECT 'concat' AS strategy,
         |    CAST((sum(n_tokens) + $PAIR_CTX - 1) // $PAIR_CTX AS BIGINT) AS n_bins,
         |    CAST(((sum(n_tokens) + $PAIR_CTX - 1) // $PAIR_CTX) * $PAIR_CTX
         |      - sum(n_tokens) AS BIGINT) AS pad_tokens FROM l)
         |SELECT * FROM (SELECT * FROM pr UNION ALL SELECT * FROM sg
         |  UNION ALL SELECT * FROM cc) ORDER BY strategy""".stripMargin.replace("\n", " "),

    // mirror of Packing.bucketBatches: per-bucket row_number, integer
    // batch arithmetic
    "d126_bucket_batches" ->
      s"""WITH l AS (SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |r AS (SELECT doc_id, n_tokens, n_tokens // $BUCKET_W AS bkt,
         |    CAST(row_number() OVER (PARTITION BY n_tokens // $BUCKET_W
         |      ORDER BY n_tokens, doc_id) AS BIGINT) AS rn FROM l)
         |SELECT doc_id, n_tokens, CAST(bkt AS BIGINT) AS bkt,
         |  CAST((rn - 1) // $BATCH_B AS BIGINT) AS batch_id,
         |  CAST((rn - 1) % $BATCH_B AS BIGINT) AS slot
         |FROM r ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // mirror of Packing.bucketBatchStats: pad-to-batch-max bills of the
    // bucketed layout vs hash-order arrival batching
    "d127_batch_pad" ->
      s"""WITH l AS (SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |r AS (SELECT doc_id, n_tokens,
         |    CAST(row_number() OVER (PARTITION BY n_tokens // $BUCKET_W
         |      ORDER BY n_tokens, doc_id) AS BIGINT) AS rn,
         |    n_tokens // $BUCKET_W AS bkt FROM l),
         |bb AS (SELECT bkt, (rn - 1) // $BATCH_B AS batch_id,
         |    count(*) AS n, max(n_tokens) AS mx, sum(n_tokens) AS s
         |  FROM r GROUP BY 1, 2),
         |pb AS (SELECT 'bucketed' AS strategy,
         |    CAST(count(*) AS BIGINT) AS n_batches,
         |    CAST(sum(n * mx - s) AS BIGINT) AS pad_tokens FROM bb),
         |sh AS (SELECT doc_id, n_tokens,
         |    CAST(row_number() OVER (ORDER BY h, doc_id) - 1 AS BIGINT) AS rk
         |  FROM (SELECT doc_id, n_tokens,
         |    ${duckHash60("CAST(doc_id AS VARCHAR)")} AS h FROM l)),
         |sb AS (SELECT rk // $BATCH_B AS batch_id, count(*) AS n,
         |    max(n_tokens) AS mx, sum(n_tokens) AS s FROM sh GROUP BY 1),
         |ps AS (SELECT 'shuffled' AS strategy,
         |    CAST(count(*) AS BIGINT) AS n_batches,
         |    CAST(sum(n * mx - s) AS BIGINT) AS pad_tokens FROM sb)
         |SELECT * FROM (SELECT * FROM pb UNION ALL SELECT * FROM ps)
         |ORDER BY strategy""".stripMargin.replace("\n", " "),

    // mirror of Packing.packSequences: explode each doc over the ctx
    // windows its global span covers; pure integer arithmetic
    "d48_pack_ctx" ->
      s"""WITH $tokenOffsetCtes,
         |pctx AS (SELECT doc_id, n_tokens, start_token,
         |  unnest(range(start_token // $CTX_LEN,
         |               (start_token + n_tokens - 1) // $CTX_LEN + 1)) AS ctx_id
         |  FROM pos)
         |SELECT doc_id, CAST(ctx_id AS BIGINT) AS ctx_id,
         |  CAST(greatest(start_token, ctx_id * $CTX_LEN) - ctx_id * $CTX_LEN AS BIGINT) AS ctx_offset,
         |  CAST(greatest(start_token, ctx_id * $CTX_LEN) - start_token AS BIGINT) AS doc_offset,
         |  CAST(least(start_token + n_tokens, (ctx_id + 1) * $CTX_LEN)
         |       - greatest(start_token, ctx_id * $CTX_LEN) AS BIGINT) AS len
         |FROM pctx ORDER BY ctx_id, doc_id""".stripMargin.replace("\n", " "),

    // mirror of Packing.interleavedPack: the d47/d48 prefix-sum chain
    // widened by the m03 frame arithmetic (media patch tokens first),
    // window tiling verbatim, media/text split as interval arithmetic
    "m07_interleaved_pack" -> {
      val nm = s"CAST((((octet_length(encode(text)) // $FRAME_BYTES) + ${FRAME_STRIDE - 1}) // $FRAME_STRIDE) * $PATCH_TOKENS AS BIGINT)"
      s"""WITH mmb AS (SELECT doc_id,
         |  $nm + CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
         |  $nm AS n_media,
         |  ${duckHash60("CAST(doc_id AS VARCHAR)")} AS k FROM documents),
         |mmbb AS (SELECT *, k >> 52 AS bkt FROM mmb),
         |mmwc AS (SELECT *, sum(n_tokens) OVER (PARTITION BY bkt ORDER BY k, doc_id) AS cum FROM mmbb),
         |mmbo AS (SELECT bkt, CAST(sum(bt) OVER (ORDER BY bkt) - bt AS BIGINT) AS off
         |  FROM (SELECT bkt, sum(n_tokens) AS bt FROM mmbb GROUP BY 1)),
         |mmos AS (SELECT doc_id, n_tokens, n_media, CAST(off + cum - n_tokens AS BIGINT) AS start_token
         |  FROM mmwc JOIN mmbo USING (bkt)),
         |mmctx AS (SELECT doc_id, n_tokens, n_media, start_token,
         |  unnest(range(start_token // $CTX_LEN,
         |               (start_token + n_tokens - 1) // $CTX_LEN + 1)) AS ctx_id
         |  FROM mmos),
         |mspan AS (SELECT doc_id, n_media, CAST(ctx_id AS BIGINT) AS ctx_id,
         |  CAST(greatest(start_token, ctx_id * $CTX_LEN) - ctx_id * $CTX_LEN AS BIGINT) AS ctx_offset,
         |  CAST(greatest(start_token, ctx_id * $CTX_LEN) - start_token AS BIGINT) AS doc_offset,
         |  CAST(least(start_token + n_tokens, (ctx_id + 1) * $CTX_LEN)
         |       - greatest(start_token, ctx_id * $CTX_LEN) AS BIGINT) AS len
         |  FROM mmctx)
         |SELECT doc_id, ctx_id, ctx_offset, doc_offset, len,
         |  CAST(least(n_media, doc_offset + len) - least(n_media, doc_offset) AS BIGINT) AS media_len,
         |  CAST(len - (least(n_media, doc_offset + len) - least(n_media, doc_offset)) AS BIGINT) AS text_len
         |FROM mspan ORDER BY ctx_id, doc_id""".stripMargin.replace("\n", " ")
    },

    // mirror of TextAnalysis.saveBigramLm + bigramLmScoreIndexed: the
    // en-trained model recomputed from scratch (the round trip through
    // parquet must be invisible), three-tier backoff as the same
    // coalesce over two left joins
    "d49_bigram_lm_xdomain" ->
      s"""WITH rt AS (SELECT doc_id, string_split(text,' ') AS w
         |           FROM documents WHERE lang = 'en'),
         |rg AS (SELECT unnest(list_slice(w, 1, len(w)-1)) AS prev,
         |        unnest(list_slice(w, 2, len(w))) AS cur FROM rt WHERE len(w) >= 2),
         |rc2 AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS c2 FROM rg GROUP BY 1, 2),
         |rc1 AS (SELECT prev, CAST(sum(c2) AS BIGINT) AS c1 FROM rc2 GROUP BY 1),
         |rv AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS v
         |       FROM (SELECT unnest([prev, cur]) AS t FROM rc2)),
         |rmodel AS (SELECT prev, cur,
         |  CAST(ln(CAST(c1 + v AS DOUBLE) / CAST(c2 + 1 AS DOUBLE)) AS DECIMAL(28,8)) AS nll
         |  FROM rc2 JOIN rc1 USING (prev) CROSS JOIN rv),
         |rctx AS (SELECT prev, CAST(ln(CAST(c1 + v AS DOUBLE)) AS DECIMAL(28,8)) AS unseen_nll
         |  FROM rc1 CROSS JOIN rv),
         |roov AS (SELECT CAST(ln(CAST(v AS DOUBLE)) AS DECIMAL(28,8)) AS oov_nll FROM rv),
         |st AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
         |sg AS (SELECT doc_id, unnest(list_slice(w, 1, len(w)-1)) AS prev,
         |        unnest(list_slice(w, 2, len(w))) AS cur FROM st WHERE len(w) >= 2),
         |sc AS (SELECT doc_id, coalesce(m.nll, x.unseen_nll, o.oov_nll) AS nll_eff
         |  FROM sg LEFT JOIN rmodel m USING (prev, cur)
         |  LEFT JOIN rctx x USING (prev) CROSS JOIN roov o)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(sum(nll_eff) AS DOUBLE) / count(*) AS avg_nll
         |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // mirror of Packing.saveTokenShards' store contents: d47's shard
    // assignment re-joined to text, summarized per shard with an
    // order-independent bit_xor over the hash60 content digests
    "d50_shard_store" ->
      s"""WITH $tokenOffsetCtes,
         |psh AS (SELECT p.doc_id, p.n_tokens,
         |  CAST(start_token // $SHARD_BUDGET AS BIGINT) AS shard_id, d.text
         |  FROM pos p JOIN documents d USING (doc_id))
         |SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  bit_xor(${duckHash60("text")}) AS text_h
         |FROM psh GROUP BY shard_id ORDER BY shard_id""".stripMargin.replace("\n", " "),

    // mirror of TextAnalysis.dsirWeights: two bigramModelCtes chains
    // (target = en slice, corpus = all) joined against one gram stream,
    // the keep gate compared on the exact decimal sums
    "d53_dsir_weights" ->
      s"""WITH $dsirScoreCtes
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(sum(t_eff) AS DOUBLE) / count(*) AS t_avg_nll,
         |  CAST(sum(c_eff) AS DOUBLE) / count(*) AS c_avg_nll,
         |  CAST(sum(c_eff) - sum(t_eff) AS DOUBLE) / count(*) AS weight,
         |  (sum(c_eff) >= sum(t_eff)) AS keep
         |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // mirror of TextAnalysis.dsirSelect: d53's weight chain through the
    // d46 distributed-rank device (descending weight, doc_id ties),
    // selection = the top third
    "d54_dsir_select" ->
      s"""WITH $dsirScoreCtes,
         |dw AS (SELECT doc_id,
         |  CAST(sum(c_eff) - sum(t_eff) AS DOUBLE) / count(*) AS weight
         |  FROM sc GROUP BY doc_id),
         |ws AS (SELECT doc_id, weight,
         |       CAST(floor(-weight * $LM_SCALE) AS BIGINT) AS bkt FROM dw),
         |wbc AS (SELECT bkt, CAST(count(*) AS BIGINT) AS bc FROM ws GROUP BY 1),
         |wbo AS (SELECT bkt, CAST(sum(bc) OVER (ORDER BY bkt) - bc AS BIGINT) AS off FROM wbc),
         |wtot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM dw),
         |wrk AS (SELECT doc_id, weight,
         |  CAST(off + row_number() OVER (PARTITION BY bkt ORDER BY weight DESC, doc_id) AS BIGINT) AS rnk
         |  FROM ws JOIN wbo USING (bkt))
         |SELECT doc_id, weight, rnk, ((rnk - 1) * 3 < n_total) AS selected
         |FROM wrk CROSS JOIN wtot ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // mirror of Classifier.trainPerceptron: the pass-by-pass perceptron
    // chain (perceptronCtes), final weights = pw{CLS_PASSES}
    "d68_classifier_train" ->
      s"""WITH $perceptronCtes
         |SELECT bucket, wt AS w FROM pw$CLS_PASSES ORDER BY bucket"""
        .stripMargin.replace("\n", " "),

    // mirror of Classifier.classifyPerceptron: one more margin pass
    // under the final weights, gate = margin > 0
    "d69_classifier_select" ->
      s"""WITH $perceptronCtes,
         |pfin AS (SELECT f.doc_id, CAST(sum(f.x * w.wt) AS BIGINT) AS margin
         |  FROM pfeat f JOIN pw$CLS_PASSES w USING (bucket) GROUP BY f.doc_id)
         |SELECT p.doc_id, p.margin, (p.margin > 0) AS predicted, l.y,
         |  ((p.margin > 0) = (l.y = 1)) AS correct
         |FROM pfin p JOIN plab l USING (doc_id) ORDER BY p.doc_id"""
        .stripMargin.replace("\n", " "),

    // mirror of Classifier.classifyIndexed over the d68-trained
    // artifact: the SAME perceptron chain — persistence must not change
    // a single scored margin
    "d73_classifier_indexed" ->
      s"""WITH $perceptronCtes,
         |pfin AS (SELECT f.doc_id, CAST(sum(f.x * w.wt) AS BIGINT) AS margin
         |  FROM pfeat f JOIN pw$CLS_PASSES w USING (bucket) GROUP BY f.doc_id)
         |SELECT doc_id, margin, (margin > 0) AS predicted
         |FROM pfin ORDER BY doc_id"""
        .stripMargin.replace("\n", " "),

    // mirror of Classifier.classifyAveraged: the pass CTEs joined
    // bucket-wise into the exact integer weight sum, then the d69
    // scoring tail under it
    "d74_classifier_averaged" -> {
      val sum = (1 to CLS_PASSES).map(k => s"w$k.wt").mkString(" + ")
      val joins = (2 to CLS_PASSES)
        .map(k => s"JOIN pw$k w$k ON w1.bucket = w$k.bucket").mkString(" ")
      s"""WITH $perceptronCtes,
         |paw AS (SELECT w1.bucket, CAST($sum AS BIGINT) AS wt
         |  FROM pw1 w1 $joins),
         |pfin AS (SELECT f.doc_id, CAST(sum(f.x * w.wt) AS BIGINT) AS margin
         |  FROM pfeat f JOIN paw w USING (bucket) GROUP BY f.doc_id)
         |SELECT p.doc_id, p.margin, (p.margin > 0) AS predicted, l.y,
         |  ((p.margin > 0) = (l.y = 1)) AS correct
         |FROM pfin p JOIN plab l USING (doc_id) ORDER BY p.doc_id"""
        .stripMargin.replace("\n", " ")
    },

    // mirror of Classifier.updateClassifier's history-then-increment
    // trajectory: the history chain from zero, ONE continuation pass
    // over the increment slice starting from the history weights, full
    // corpus scored under the result
    "d75_classifier_update" -> classifierUpdateSql,

    // mirror of Classifier.classifierSync's grown-corpus round trip:
    // sync's update path IS updateClassifier on the increment, so the
    // served margins are d75's verbatim
    "d76_classifier_sync" -> classifierUpdateSql,

    // mirror of Dedup.saveLshIndex + lshDedupIndexed: history bands
    // (probe-time bucket cap) × increment bands → signature-agreement
    // estimates → best match + threshold verdict per increment doc
    "d77_lsh_indexed" -> lshIndexedSql,

    // d78: append ≡ rebuild exactly (signatures are parameter-derived),
    // so the appended index serves d77's oracle verbatim
    "d78_lsh_appended" -> lshIndexedSql,

    // d79: sync's append path IS appendLshIndex, so the served verdicts
    // are d77's verbatim
    "d79_lsh_sync" -> lshIndexedSql,

    // mirror of the d157 snapshot probe: the d77 chain with the index
    // side cut to version 1's watermark (the 3/4 cut of history) — the
    // bucket cap inside the chain then counts snapshot buckets, exactly
    // as the as-of read serves them
    "d157_lsh_time_travel" -> lshIndexedSqlFor(
      "doc_id % 4 <> 0 AND doc_id <= (SELECT CAST(max(doc_id) * 3 // 4 AS BIGINT) FROM documents WHERE doc_id % 4 <> 0)"),

    // mirror of Dedup.hllGramCardinality: same register construction
    // (low-8-bit index, rank via length(bin(w)) — identical string form
    // in both engines), exact integer harmonic sum (BIGINT-shifted,
    // DuckDB's HUGEINT sum cast back down), and the shared α·m²·2^53
    // double literal so the one division is bit-identical
    "d81_hll_grams" -> {
      val m = 256; val L1 = 53 // p = 8, L+1 = 53
      val a = graft.operators.Dedup.hllAlphaNum(8)
      s"""WITH $shingleCte,
         |hg AS (SELECT d.lang, shh.hs FROM shh JOIN documents d USING (doc_id)),
         |hr AS (SELECT lang, hs % $m AS j, hs // $m AS w FROM hg),
         |hrho AS (SELECT lang, j, CASE WHEN w = 0 THEN $L1
         |  ELSE CAST($L1 - length(bin(w)) AS INT) END AS rho FROM hr),
         |hm AS (SELECT lang, j, max(rho) AS mj FROM hrho GROUP BY 1, 2),
         |hgrid AS (SELECT lang, CAST(range AS BIGINT) AS j
         |  FROM (SELECT DISTINCT lang FROM hg), range(0, $m)),
         |hsm AS (SELECT lang, CAST(sum(CAST(1 AS BIGINT) << ($L1 - coalesce(mj, 0))) AS BIGINT) AS s
         |  FROM hgrid LEFT JOIN hm USING (lang, j) GROUP BY lang),
         |hx AS (SELECT lang, CAST(count(DISTINCT hs) AS BIGINT) AS n_exact FROM hg GROUP BY 1)
         |SELECT hx.lang, n_exact, $a / CAST(s AS DOUBLE) AS hll_est,
         |  ($a / CAST(s AS DOUBLE) - n_exact) / n_exact AS rel_err
         |FROM hx JOIN hsm USING (lang) ORDER BY hx.lang"""
        .stripMargin.replace("\n", " ")
    },

    // mirror of the d85 composition: the d19 keep query wrapped as a
    // derived table (it carries its own WITH RECURSIVE scope), the d46
    // tier chain, and the d69 perceptron margin, joined on doc_id —
    // each leg IS its own registered oracle's chain verbatim
    "d85_full_curation" ->
      s"""WITH $fullCurationCtes
         |SELECT ck.doc_id, ck.keep AS curation_keep, tser.tier,
         |  csel.selected AS cls_keep,
         |  (ck.keep AND tser.tier <> 'tail' AND csel.selected) AS selected
         |FROM ck JOIN tser ON tser.doc_id = ck.doc_id
         |JOIN csel ON csel.doc_id = ck.doc_id
         |ORDER BY ck.doc_id""".stripMargin.replace("\n", " "),

    // mirror of the d88 composition: the full d85 verdict chain reduced
    // to its selected set, then the d47 prefix-sum/shard-assignment
    // chain run over ONLY those documents (the curated stream packs
    // contiguously from token 0)
    "d88_curated_store" ->
      s"""WITH $fullCurationCtes,
         |seld AS (SELECT ck.doc_id FROM ck
         |  JOIN tser ON tser.doc_id = ck.doc_id
         |  JOIN csel ON csel.doc_id = ck.doc_id
         |  WHERE ck.keep AND tser.tier <> 'tail' AND csel.selected),
         |${tokenOffsetCtesFor("z",
            "WHERE doc_id IN (SELECT doc_id FROM seld)")}
         |SELECT doc_id, n_tokens, start_token,
         |  CAST(start_token // $SHARD_BUDGET AS BIGINT) AS shard_id
         |FROM zos ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // mirror of Classifier.classifySelectTop: the shared perceptron
    // chain through the bucketed-rank cut
    "d86_classifier_topcut" ->
      s"""WITH $perceptronCtes,
         |$classifierTopCutCtes
         |SELECT doc_id, margin, rnk, selected FROM csel ORDER BY doc_id"""
        .stripMargin.replace("\n", " "),

    // mirror of Dedup.lshBandCurve: the d04 exact-pair chain as truth,
    // candidates from the shared capped band table restricted to the
    // first nb bands (cap verdicts are per-bucket, so restriction ≡
    // recomputation and the sets nest)
    "d84_lsh_band_curve" -> {
      val rowSel = Seq(2, 4, 8, 16).map { nb =>
        s"""SELECT CAST($nb AS BIGINT) AS n_bands,
           |  (SELECT CAST(count(*) AS BIGINT) FROM btruth) AS n_truth,
           |  (SELECT CAST(count(*) AS BIGINT) FROM btruth t JOIN
           |     (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM blb64 x
           |      JOIN blb64 y ON x.bno = y.bno AND x.bkey = y.bkey AND x.doc_id < y.doc_id
           |      WHERE x.bno < $nb) c ON c.a = t.a AND c.b = t.b) AS n_found"""
          .stripMargin
      }.mkString(" UNION ALL ")
      s"""WITH ${minhashEstCtesOver("doc_id % 2 = 0 AND")},
         |$dfCapCte,
         |bcard AS (SELECT doc_id, count(*) AS c FROM shc GROUP BY 1),
         |bint AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
         |         FROM shc x JOIN shc y ON x.hs = y.hs AND x.doc_id < y.doc_id GROUP BY 1, 2),
         |btruth AS (SELECT a, b FROM bint JOIN bcard ca ON ca.doc_id = a
         |           JOIN bcard cb ON cb.doc_id = b
         |           WHERE CAST(i AS DOUBLE)/(ca.c + cb.c - i) >= 0.5)
         |SELECT n_bands, n_truth, n_found,
         |  CASE WHEN n_truth > 0 THEN CAST(n_found AS DOUBLE) / n_truth END AS recall
         |FROM ($rowSel) ORDER BY n_bands""".stripMargin.replace("\n", " ")
    },

    // mirror of TextAnalysis.heapsCurve: top-3-bit hash checkpoints,
    // map-side-combined first-occurrence mins, cumulative windows over
    // the 8-row table, β from DECIMAL-quantized lns (exact subtraction,
    // one double divide)
    "d83_heaps_curve" ->
      s"""WITH hb AS (SELECT doc_id, text,
         |  (${duckHash60("CAST(doc_id AS VARCHAR)")} >> 57) AS chk FROM documents),
         |hpc AS (SELECT chk, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(len(string_split(text,' '))) AS BIGINT) AS n_tokens FROM hb GROUP BY 1),
         |hfc AS (SELECT word, min(chk) AS fc
         |  FROM (SELECT chk, unnest(string_split(text,' ')) AS word FROM hb) GROUP BY 1),
         |hnw AS (SELECT fc AS chk, CAST(count(*) AS BIGINT) AS n_new FROM hfc GROUP BY 1),
         |hcm AS (SELECT chk,
         |  CAST(sum(n_docs) OVER w AS BIGINT) AS n_docs_cum,
         |  CAST(sum(n_tokens) OVER w AS BIGINT) AS n_tokens_cum,
         |  CAST(sum(coalesce(n_new, 0)) OVER w AS BIGINT) AS vocab_cum
         |  FROM hpc LEFT JOIN hnw USING (chk) WINDOW w AS (ORDER BY chk)),
         |hln AS (SELECT *, CAST(ln(CAST(vocab_cum AS DOUBLE)) AS DECIMAL(28,8)) AS lnv,
         |  CAST(ln(CAST(n_tokens_cum AS DOUBLE)) AS DECIMAL(28,8)) AS lnt FROM hcm)
         |SELECT CAST(chk AS BIGINT) AS chk, n_docs_cum, n_tokens_cum, vocab_cum,
         |  CAST(lnv - lag(lnv) OVER (ORDER BY chk) AS DOUBLE)
         |    / CAST(lnt - lag(lnt) OVER (ORDER BY chk) AS DOUBLE) AS beta
         |FROM hln ORDER BY chk""".stripMargin.replace("\n", " "),

    // mirror of TextAnalysis.doremiExcess: the d53 scoring chain with
    // the token-level clip (difference at (37,8) where it is exactly
    // representable, clipped by a CASE — DuckDB's greatest() promotes
    // DECIMAL to DOUBLE, CASE keeps it exact), per-stratum exact sums,
    // one double divide, rank over the #strata-row table
    "d80_doremi_excess" ->
      s"""WITH $dsirScoreCtes,
         |dex AS (SELECT doc_id, CASE WHEN dv > CAST(0 AS DECIMAL(38,8))
         |  THEN dv ELSE CAST(0 AS DECIMAL(38,8)) END AS ex
         |  FROM (SELECT doc_id,
         |    CAST(c_eff AS DECIMAL(37,8)) - CAST(t_eff AS DECIMAL(37,8)) AS dv FROM sc)),
         |dstr AS (SELECT d.lang, CAST(count(*) AS BIGINT) AS n_grams, sum(ex) AS ex_dec
         |  FROM dex JOIN documents d USING (doc_id) GROUP BY d.lang)
         |SELECT lang, n_grams, CAST(ex_dec AS DOUBLE) AS excess_sum,
         |  CAST(ex_dec AS DOUBLE) / n_grams AS lambda,
         |  CAST(row_number() OVER (ORDER BY CAST(ex_dec AS DOUBLE) / n_grams DESC, lang) AS BIGINT) AS rnk
         |FROM dstr ORDER BY lang""".stripMargin.replace("\n", " "),

    // mirror of Sampling.weightedSample: the Efraimidis–Spirakis
    // log-domain priority (ln(u)/w at DECIMAL(28,8)), doc_id tiebreak,
    // LIMIT = the top-k
    "d70_weighted_sample" ->
      s"""WITH ws AS (SELECT doc_id, CAST(n_chars AS DOUBLE) AS w,
         |  CAST(${duckHash60("CAST(doc_id AS VARCHAR)")} AS DOUBLE)
         |    / 1152921504606846976.0 AS u
         |  FROM documents WHERE CAST(n_chars AS DOUBLE) > 0)
         |SELECT doc_id, w, CAST(CAST(ln(u) / w AS DECIMAL(28,8)) AS DOUBLE) AS priority
         |FROM ws ORDER BY priority DESC, doc_id LIMIT $WSAMPLE_K"""
        .stripMargin.replace("\n", " "),

    // mirror of Curation.temperatureMixture: n^α at DECIMAL(28,8), the
    // normalizing sum exact, every downstream step one double op in the
    // Spark association
    "d71_temperature_mixture" ->
      s"""WITH ${langStrataCtes("text, ",
             ", CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens")},
         |per AS (SELECT stratum, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
         |        FROM l GROUP BY 1),
         |pp AS (SELECT stratum, n_tokens,
         |  CAST(pow(CAST(n_tokens AS DOUBLE), $TEMP_ALPHA) AS DECIMAL(28,8)) AS pow_alpha
         |  FROM per),
         |pt AS (SELECT sum(pow_alpha) AS pa_tot,
         |  CAST(sum(n_tokens) AS BIGINT) AS tok_tot FROM pp)
         |SELECT stratum, n_tokens, CAST(pow_alpha AS DOUBLE) AS pow_alpha,
         |  CAST(pow_alpha AS DOUBLE) / CAST(pa_tot AS DOUBLE) AS p_frac,
         |  (CAST(tok_tot AS DOUBLE) * $UNIMAX_BUDGET)
         |    * (CAST(pow_alpha AS DOUBLE) / CAST(pa_tot AS DOUBLE)) AS exp_tokens,
         |  ((CAST(tok_tot AS DOUBLE) * $UNIMAX_BUDGET)
         |    * (CAST(pow_alpha AS DOUBLE) / CAST(pa_tot AS DOUBLE)))
         |    / CAST(n_tokens AS DOUBLE) AS epochs
         |FROM pp CROSS JOIN pt ORDER BY stratum"""
        .stripMargin.replace("\n", " "),

    // mirror of Dedup.softDedupWeights: per-gram ln(df/N) at
    // DECIMAL(28,8) over the shared hashed-shingle stream, exact
    // decimal sum, one double divide for the mean
    "d72_softdedup_weights" ->
      s"""WITH $shingleCte,
         |sdn AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         |sdf AS (SELECT hs, CAST(count(*) AS BIGINT) AS df FROM shh GROUP BY 1),
         |sdl AS (SELECT doc_id,
         |  CAST(ln(CAST(df AS DOUBLE) / CAST(n_docs AS DOUBLE)) AS DECIMAL(28,8)) AS lp
         |  FROM shh JOIN sdf USING (hs) CROSS JOIN sdn)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |  CAST(sum(lp) AS DOUBLE) / count(*) AS log_commonness
         |FROM sdl GROUP BY doc_id ORDER BY doc_id"""
        .stripMargin.replace("\n", " "),

    // mirror of Packing.appendTokenShards' two-stage placement: the
    // history chain (doc_id <= 3/4 cut) runs the shared prefix sum
    // verbatim; the increment chain prefix-sums among itself and is
    // offset by the history token total; shard ids derive from the
    // combined stream. Same per-shard summary as d50.
    "d51_shard_append" ->
      s"""WITH cutv AS (SELECT CAST(max(doc_id) * 3 // 4 AS BIGINT) AS cut FROM documents),
         |${tokenOffsetCtesFor("h", "WHERE doc_id <= (SELECT cut FROM cutv)")},
         |htot AS (SELECT CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS base FROM hb),
         |${tokenOffsetCtesFor("i", "WHERE doc_id > (SELECT cut FROM cutv)")},
         |allpos AS (SELECT doc_id, n_tokens, start_token FROM hos
         |  UNION ALL SELECT doc_id, n_tokens, start_token + base AS start_token
         |  FROM ios CROSS JOIN htot),
         |psh AS (SELECT a.doc_id, a.n_tokens,
         |  CAST(start_token // $SHARD_BUDGET AS BIGINT) AS shard_id, d.text
         |  FROM allpos a JOIN documents d USING (doc_id))
         |SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  bit_xor(${duckHash60("text")}) AS text_h
         |FROM psh GROUP BY shard_id ORDER BY shard_id""".stripMargin.replace("\n", " "),

    // mirror of Packing.readShardStoreAt: the snapshot-v1 store IS the
    // history half built fresh (frozen files + verbatim start_tokens +
    // one doc_id cut), so the oracle is the d50 per-shard summary chain
    // over the 3/4-cut corpus
    "d155_shard_time_travel" ->
      s"""WITH cutv AS (SELECT CAST(max(doc_id) * 3 // 4 AS BIGINT) AS cut FROM documents),
         |${tokenOffsetCtesFor("h", "WHERE doc_id <= (SELECT cut FROM cutv)")},
         |psh AS (SELECT p.doc_id, p.n_tokens,
         |  CAST(start_token // $SHARD_BUDGET AS BIGINT) AS shard_id, d.text
         |  FROM hos p JOIN documents d USING (doc_id))
         |SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  bit_xor(${duckHash60("text")}) AS text_h
         |FROM psh GROUP BY shard_id ORDER BY shard_id""".stripMargin.replace("\n", " "),

    // mirror of Packing.shardStoreDiff(1, 2): the d51 increment half
    // alone — increment rows prefix-summed among themselves, offset by
    // the frozen history token total, summarized per shard
    "d158_shard_version_diff" ->
      s"""WITH cutv AS (SELECT CAST(max(doc_id) * 3 // 4 AS BIGINT) AS cut FROM documents),
         |${tokenOffsetCtesFor("h", "WHERE doc_id <= (SELECT cut FROM cutv)")},
         |htot AS (SELECT CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS base FROM hb),
         |${tokenOffsetCtesFor("i", "WHERE doc_id > (SELECT cut FROM cutv)")},
         |ipsh AS (SELECT i.doc_id, i.n_tokens,
         |  CAST((start_token + base) // $SHARD_BUDGET AS BIGINT) AS shard_id, d.text
         |  FROM ios i CROSS JOIN htot JOIN documents d USING (doc_id))
         |SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  bit_xor(${duckHash60("text")}) AS text_h
         |FROM ipsh GROUP BY shard_id ORDER BY shard_id""".stripMargin.replace("\n", " "),

    // mirror of Packing.packShardStoreAt: the d55 per-shard window
    // chain over the snapshot-v1 (history-cut) rows
    "d156_pack_shards_asof" ->
      s"""WITH cutv AS (SELECT CAST(max(doc_id) * 3 // 4 AS BIGINT) AS cut FROM documents),
         |${tokenOffsetCtesFor("h", "WHERE doc_id <= (SELECT cut FROM cutv)")},
         |psh AS (SELECT doc_id, n_tokens, start_token,
         |  CAST(start_token // $SHARD_BUDGET AS BIGINT) AS shard_id FROM hos),
         |lo AS (SELECT shard_id, doc_id, n_tokens,
         |  CAST(sum(n_tokens) OVER (PARTITION BY shard_id ORDER BY start_token)
         |       - n_tokens AS BIGINT) AS local_start FROM psh),
         |pctx AS (SELECT shard_id, doc_id, n_tokens, local_start,
         |  unnest(range(local_start // $CTX_LEN,
         |               (local_start + n_tokens - 1) // $CTX_LEN + 1)) AS ctx_id
         |  FROM lo)
         |SELECT shard_id, doc_id, CAST(ctx_id AS BIGINT) AS ctx_id,
         |  CAST(greatest(local_start, ctx_id * $CTX_LEN) - ctx_id * $CTX_LEN AS BIGINT) AS ctx_offset,
         |  CAST(greatest(local_start, ctx_id * $CTX_LEN) - local_start AS BIGINT) AS doc_offset,
         |  CAST(least(local_start + n_tokens, (ctx_id + 1) * $CTX_LEN)
         |       - greatest(local_start, ctx_id * $CTX_LEN) AS BIGINT) AS len
         |FROM pctx ORDER BY shard_id, ctx_id, doc_id""".stripMargin.replace("\n", " "),

    // mirror of Packing.packShardStore over a fresh d47 store: shard
    // assignment from the shared prefix-sum chain, then a LOCAL running
    // sum per shard (window partitioned by shard_id — the whole point)
    // and the same window-explode arithmetic as d48
    "d55_pack_shards" ->
      s"""WITH $tokenOffsetCtes,
         |psh AS (SELECT doc_id, n_tokens, start_token,
         |  CAST(start_token // $SHARD_BUDGET AS BIGINT) AS shard_id FROM pos),
         |lo AS (SELECT shard_id, doc_id, n_tokens,
         |  CAST(sum(n_tokens) OVER (PARTITION BY shard_id ORDER BY start_token)
         |       - n_tokens AS BIGINT) AS local_start FROM psh),
         |pctx AS (SELECT shard_id, doc_id, n_tokens, local_start,
         |  unnest(range(local_start // $CTX_LEN,
         |               (local_start + n_tokens - 1) // $CTX_LEN + 1)) AS ctx_id
         |  FROM lo)
         |SELECT shard_id, doc_id, CAST(ctx_id AS BIGINT) AS ctx_id,
         |  CAST(greatest(local_start, ctx_id * $CTX_LEN) - ctx_id * $CTX_LEN AS BIGINT) AS ctx_offset,
         |  CAST(greatest(local_start, ctx_id * $CTX_LEN) - local_start AS BIGINT) AS doc_offset,
         |  CAST(least(local_start + n_tokens, (ctx_id + 1) * $CTX_LEN)
         |       - greatest(local_start, ctx_id * $CTX_LEN) AS BIGINT) AS len
         |FROM pctx ORDER BY shard_id, ctx_id, doc_id""".stripMargin.replace("\n", " "),

    // mirror of TextAnalysis.gopherRules (marker-vocab stop list): the
    // same exact-long signal extraction, one double division per
    // fraction, rule bits as literal comparisons
    "d56_gopher_rules" -> {
      val stopSum = TextAnalysis.markers.head._2
        .map(s => s"CAST(list_contains(string_split(text, ' '), '$s') AS BIGINT)")
        .mkString(" + ")
      s"""WITH g AS (SELECT doc_id,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         |  CAST(len(replace(text, ' ', '')) AS BIGINT) AS wchars,
         |  CAST(len(text) - len(replace(text, '#', '')) AS BIGINT) AS n_hash,
         |  CAST((len(text) - len(replace(text, '...', ''))) // 3 AS BIGINT) AS n_ellipsis,
         |  CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
         |  CAST(len(list_filter(string_split(text, chr(10)),
         |    l -> l LIKE '- %' OR l LIKE '* %' OR l LIKE '• %')) AS BIGINT) AS n_bullet,
         |  CAST(len(list_filter(string_split(text, chr(10)), l -> l LIKE '%...')) AS BIGINT) AS n_ell_lines,
         |  CAST(len(list_filter(string_split(text, ' '),
         |    x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT) AS n_alpha,
         |  $stopSum AS n_stop
         |  FROM documents),
         |f AS (SELECT doc_id, n_words,
         |  CAST(wchars AS DOUBLE) / n_words AS mean_word_len,
         |  CAST(n_hash + n_ellipsis AS DOUBLE) / n_words AS symbol_ratio,
         |  CAST(n_bullet AS DOUBLE) / n_lines AS bullet_frac,
         |  CAST(n_ell_lines AS DOUBLE) / n_lines AS ellipsis_frac,
         |  CAST(n_alpha AS DOUBLE) / n_words AS alpha_frac, n_stop FROM g)
         |SELECT *,
         |  (ok_words AND ok_word_len AND ok_symbol AND ok_bullet
         |   AND ok_ellipsis AND ok_alpha AND ok_stop) AS keep
         |FROM (SELECT *,
         |  (n_words >= 50 AND n_words <= 100000) AS ok_words,
         |  (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS ok_word_len,
         |  (symbol_ratio <= 0.1) AS ok_symbol,
         |  (bullet_frac <= 0.9) AS ok_bullet,
         |  (ellipsis_frac <= 0.3) AS ok_ellipsis,
         |  (alpha_frac >= 0.8) AS ok_alpha,
         |  (n_stop >= 2) AS ok_stop FROM f)
         |ORDER BY doc_id""".stripMargin.replace("\n", " ")
    },

    // mirror of TextAnalysis.c4LineFilter: the same list_filter over
    // split lines (LIKE line-end checks — no regex), doc gates, and
    // CASE'd rejoin
    "d57_c4_filter" ->
      s"""WITH c AS (SELECT doc_id, string_split(text, chr(10)) AS lines,
         |  contains(text, '{') AS has_brace,
         |  contains(lower(text), 'lorem ipsum') AS has_lorem FROM documents),
         |k AS (SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
         |  list_filter(lines, l ->
         |    (l LIKE '%.' OR l LIKE '%!' OR l LIKE '%?' OR l LIKE '%"')
         |    AND len(string_split(l, ' ')) >= 5
         |    AND NOT contains(lower(l), 'javascript')) AS kept,
         |  has_brace, has_lorem FROM c),
         |v AS (SELECT doc_id, n_lines, CAST(len(kept) AS BIGINT) AS n_kept,
         |  has_brace, has_lorem, kept,
         |  (NOT has_brace AND NOT has_lorem AND len(kept) >= 3) AS keep FROM k)
         |SELECT doc_id, n_lines, n_kept, has_brace, has_lorem, keep,
         |  CASE WHEN keep THEN array_to_string(kept, chr(10)) ELSE '' END AS text_out
         |FROM v ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // mirror of TextAnalysis.gopherRepetition: the same nested
    // list-lambda counting per n, argmax ties to the list_min gram,
    // fractions as one double multiply/divide over exact ints
    "d60_gopher_repetition" -> {
      val ns = Seq(2, 3, 4)
      val gCols = ns.map(n =>
        s"""CASE WHEN len(w) >= $n THEN list_transform(range(1, len(w) - ${n - 2}),
           |  i -> array_to_string(list_slice(w, i, i + ${n - 1}), ' ')) ELSE [] END AS g$n"""
          .stripMargin).mkString(", ")
      val mCols = ns.map(n =>
        s"coalesce(list_max(list_transform(g$n, x -> len(list_filter(g$n, y -> y = x)))), 0) AS m$n")
        .mkString(", ")
      val tCols = ns.map(n =>
        s"list_min(list_filter(g$n, x -> len(list_filter(g$n, y -> y = x)) = m$n)) AS t$n")
        .mkString(", ")
      val fCols = ns.map(n =>
        s"CASE WHEN m$n > 0 THEN CAST(m$n AS DOUBLE) * len(t$n) / n_chars ELSE 0.0 END AS top${n}_char_frac")
        .mkString(", ")
      s"""WITH b AS (SELECT doc_id, CAST(len(text) AS BIGINT) AS n_chars,
         |  string_split(text, chr(10)) AS lines, string_split(text, ' ') AS w FROM documents),
         |r AS (SELECT doc_id, n_chars, w,
         |  CAST(len(lines) AS BIGINT) AS n_lines,
         |  CAST(len(list_filter(lines, l -> len(list_filter(lines, x -> x = l)) >= 2)) AS BIGINT) AS dup_slots,
         |  CAST(coalesce(list_sum(list_transform(lines,
         |    l -> CASE WHEN len(list_filter(lines, x -> x = l)) >= 2 THEN len(l) ELSE 0 END)), 0) AS BIGINT) AS dup_chars
         |  FROM b),
         |gg AS (SELECT *, $gCols FROM r),
         |mm AS (SELECT *, $mCols FROM gg),
         |tt AS (SELECT *, $tCols FROM mm),
         |ff AS (SELECT doc_id, n_lines,
         |  CAST(dup_slots AS DOUBLE) / n_lines AS dup_line_frac,
         |  CAST(dup_chars AS DOUBLE) / n_chars AS dup_line_char_frac,
         |  $fCols FROM tt)
         |SELECT *, (ok_dup_line AND ok_dup_line_char AND ok_top2 AND ok_top3 AND ok_top4) AS keep
         |FROM (SELECT *,
         |  (dup_line_frac <= 0.30) AS ok_dup_line,
         |  (dup_line_char_frac <= 0.20) AS ok_dup_line_char,
         |  (top2_char_frac <= 0.20) AS ok_top2,
         |  (top3_char_frac <= 0.18) AS ok_top3,
         |  (top4_char_frac <= 0.16) AS ok_top4 FROM ff)
         |ORDER BY doc_id""".stripMargin.replace("\n", " ")
    },

    // mirror of TextAnalysis.bpePairStats: the weighted-vocabulary
    // symbol representation (bpeHeadCtes doc), one pair aggregate,
    // ranked top-k under the total order
    "d58_bpe_pairs" ->
      s"""WITH $bpeHeadCtes,
         |${bpeStatsCte("s0", "br0")}
         |SELECT CAST(row_number() OVER (ORDER BY tf DESC, s1 ASC, s2 ASC) AS BIGINT) AS rank,
         |  s1, s2, tf FROM s0
         |ORDER BY tf DESC, s1 ASC, s2 ASC LIMIT $BPE_TOPK""".stripMargin.replace("\n", " "),

    // mirror of TextAnalysis.bpeTrain: BPE_MERGES chained stat/merge
    // stages — each stage's argmax pair becomes a literal replace on
    // the separator representation (left-to-right non-overlapping =
    // leftmost-first merge, identical in both engines)
    "d59_bpe_train" -> {
      val union = (1 to BPE_MERGES)
        .map(i => s"SELECT CAST($i AS BIGINT) AS step, s1, s2, tf FROM bm$i")
        .mkString(" UNION ALL ")
      s"""WITH $bpeHeadCtes,
         |$bpeMergeStages
         |SELECT * FROM ($union) ORDER BY step""".stripMargin.replace("\n", " ")
    },

    // mirror of TextAnalysis.bpeSpans: the final representation's
    // symbol list with ordinals; offsets as the same per-word running
    // sum window
    "d64_bpe_spans" ->
      s"""WITH $bpeHeadCtes,
         |$bpeMergeStages,
         |sy AS (SELECT word, CAST(i AS BIGINT) AS tok_idx, l[i] AS sym
         |  FROM (SELECT word, string_split(rep, '¦') AS l FROM br$BPE_MERGES),
         |  LATERAL unnest(range(1, len(l) + 1)) AS t(i))
         |SELECT word, tok_idx, sym,
         |  CAST(sum(length(sym)) OVER (PARTITION BY word ORDER BY tok_idx)
         |       - length(sym) AS BIGINT) AS start,
         |  CAST(length(sym) AS BIGINT) AS len
         |FROM sy ORDER BY word, tok_idx""".stripMargin.replace("\n", " "),

    // mirror of TextAnalysis.bpeFairness: the d61 encode chain grouped
    // by the shared language strata
    "d66_bpe_fairness" ->
      s"""WITH $bpeHeadCtes,
         |$bpeMergeStages,
         |enc AS (SELECT word, CAST(len(string_split(rep, '¦')) AS BIGINT) AS n_syms
         |  FROM br$BPE_MERGES),
         |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
         |perdoc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(n_syms) AS BIGINT) AS n_tokens_bpe
         |  FROM tok JOIN enc USING (word) GROUP BY doc_id),
         |${langStrataCtes()}
         |SELECT stratum, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_words) AS BIGINT) AS n_words,
         |  CAST(sum(n_tokens_bpe) AS BIGINT) AS n_tokens_bpe,
         |  CAST(sum(n_tokens_bpe) AS DOUBLE) / CAST(sum(n_words) AS DOUBLE) AS tokens_per_word
         |FROM perdoc JOIN l USING (doc_id)
         |GROUP BY stratum ORDER BY stratum""".stripMargin.replace("\n", " "),

    // mirror of TextAnalysis.bpeEncode: the d59 merge chain's FINAL
    // representation, symbol counts per word, docs joined back
    "d61_bpe_encode" -> bpeEncodeSql,

    // mirror of TextAnalysis.wordPieceSegments: BPE training CTEs →
    // piece vocab → greedy-walk recursion (wordPieceCtes doc)
    "d137_wordpiece_vocab" ->
      s"""WITH RECURSIVE $bpeHeadCtes,
         |$bpeMergeStages,
         |$wordPieceCtes
         |SELECT word, wc, n_pieces, seg FROM wfin
         |ORDER BY word""".stripMargin.replace("\n", " "),

    // mirror of TextAnalysis.wordPieceEncode: the d61 BPE lookup and
    // the d137 greedy lookup joined to one token stream
    "d138_wordpiece_encode" ->
      s"""WITH RECURSIVE $bpeHeadCtes,
         |$bpeMergeStages,
         |$wordPieceCtes,
         |enc AS (SELECT word, CAST(len(string_split(rep, '¦')) AS BIGINT) AS n_syms
         |  FROM br$BPE_MERGES),
         |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(n_syms) AS BIGINT) AS n_tokens_bpe,
         |  CAST(sum(n_pieces) AS BIGINT) AS n_tokens_wp
         |FROM tok JOIN enc USING (word) JOIN wfin USING (word)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // d113 reads the persisted merge table and runs the same tail —
    // same oracle text as d61 (the d104 convention: persistence must
    // not change an encoding)
    "d113_bpe_indexed" -> bpeEncodeSql,

    // mirror of Dedup.exactSubstrSpans over the shared ExactSubstr
    // chain (exSubstrCtes doc)
    "d40_exact_substr_spans" ->
      s"""WITH $exSubstrCtes
         |SELECT doc_id, start, "end", n_anchors FROM exspans
         |ORDER BY doc_id, start""".stripMargin.replace("\n", " "),

    // mirror of Dedup.exactSubstrRemoval: remove-everywhere anchors
    // under the shared cut tail (exCutSql doc)
    "d41_exact_substr_removal" ->
      s"""WITH $exGramCtes, $exAnchAllCtes, $exCutSql
         |ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // mirror of TextAnalysis.chunkDocs: starts at stride multiples
    // below len, inclusive list slices clamp the short tail
    "d112_chunking" ->
      s"""WITH st AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |ch AS (SELECT doc_id, CAST(t.i AS BIGINT) AS chunk_id,
         |  w[(CAST(t.i AS INTEGER) * $CHUNK_S + 1):(CAST(t.i AS INTEGER) * $CHUNK_S + $CHUNK_W)] AS cw
         |  FROM st, LATERAL unnest(range(0, ((len(w) - 1) // $CHUNK_S) + 1)) AS t(i))
         |SELECT doc_id, chunk_id,
         |  chunk_id * $CHUNK_S AS start_tok,
         |  CAST(len(cw) AS BIGINT) AS n_tok,
         |  array_to_string(cw, ' ') AS chunk_text
         |FROM ch ORDER BY doc_id, chunk_id""".stripMargin.replace("\n", " "),

    // mirror of TextAnalysis.tokenDrift: integer mixture ratios,
    // ln quantized at (28,8), terms at (28,12), exact decimal sums
    "d119_token_drift" ->
      s"""WITH tk AS (SELECT doc_id % 2 = 0 AS grp,
         |  unnest(string_split(text, ' ')) AS word FROM documents),
         |c AS (SELECT word,
         |  CAST(sum(CASE WHEN grp THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         |  CAST(sum(CASE WHEN NOT grp THEN 1 ELSE 0 END) AS BIGINT) AS cb
         |  FROM tk GROUP BY word),
         |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb FROM c),
         |terms AS (SELECT ca, cb, na, nb,
         |  CASE WHEN ca > 0 THEN CAST(CAST(ca AS DOUBLE)/na *
         |    CAST(CAST(ln(CAST(2*ca*nb AS DOUBLE)/CAST(ca*nb + cb*na AS DOUBLE)) AS DECIMAL(28,8)) AS DOUBLE)
         |    AS DECIMAL(28,12)) ELSE CAST(0 AS DECIMAL(28,12)) END AS pt,
         |  CASE WHEN cb > 0 THEN CAST(CAST(cb AS DOUBLE)/nb *
         |    CAST(CAST(ln(CAST(2*cb*na AS DOUBLE)/CAST(ca*nb + cb*na AS DOUBLE)) AS DECIMAL(28,8)) AS DOUBLE)
         |    AS DECIMAL(28,12)) ELSE CAST(0 AS DECIMAL(28,12)) END AS qt
         |  FROM c, t)
         |SELECT max(na) AS n_ref_tokens, max(nb) AS n_new_tokens,
         |  CAST(CAST(CAST(sum(pt) + sum(qt) AS DOUBLE) / 2 AS DECIMAL(18,10)) AS DOUBLE) AS js_div,
         |  CAST(sum(CASE WHEN ca = 0 THEN cb ELSE 0 END) AS DOUBLE) / max(nb) AS oov_mass_new,
         |  CAST(sum(CASE WHEN cb = 0 THEN ca ELSE 0 END) AS DOUBLE) / max(na) AS oov_mass_ref
         |FROM terms""".stripMargin.replace("\n", " "),

    // mirror of Similarity.embedDrift: per-(slice, dim) decimal
    // moments, the identical fixed double tree for means/variances,
    // the across-dims fold re-quantized to decimal
    "e51_embed_drift" ->
      s"""WITH dv AS (SELECT vec_id % 2 = 0 AS grp,
         |  unnest(range(1, len(embedding) + 1)) AS dim,
         |  unnest(embedding::DOUBLE[]) AS x FROM embeddings),
         |sg AS (SELECT grp, dim, count(*) AS n,
         |  sum(CAST(x AS DECIMAL(28,12))) AS sx,
         |  sum(CAST(x * x AS DECIMAL(30,12))) AS sxx
         |  FROM dv GROUP BY grp, dim),
         |ab AS (SELECT a.dim, a.n AS na, b.n AS nb,
         |  CAST(a.sx AS DOUBLE)/a.n - CAST(b.sx AS DOUBLE)/b.n AS md,
         |  (CAST(a.sxx AS DOUBLE)/a.n - (CAST(a.sx AS DOUBLE)/a.n)*(CAST(a.sx AS DOUBLE)/a.n)) /
         |  (CAST(b.sxx AS DOUBLE)/b.n - (CAST(b.sx AS DOUBLE)/b.n)*(CAST(b.sx AS DOUBLE)/b.n)) AS vr
         |  FROM sg a JOIN sg b ON a.dim = b.dim AND a.grp AND NOT b.grp)
         |SELECT CAST(max(na) AS BIGINT) AS n_ref, CAST(max(nb) AS BIGINT) AS n_new,
         |  CAST(sum(CAST(md * md AS DECIMAL(28,12))) AS DOUBLE) AS l2sq_mean_diff,
         |  CAST(sum(CAST(vr AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS mean_var_ratio
         |FROM ab""".stripMargin.replace("\n", " "),

    // the MMR greedy unrolled as chained argmax CTEs over e01's cosine
    // pool — see mmrOracleSql
    "e52_mmr_rerank" -> mmrOracleSql(MMR_QID, MMR_POOL, MMR_OUT),

    // the same greedy over the ANN-bucketed pool (e02's bucket join)
    "e53_mmr_ann" -> mmrOracleSql(MMR_QID, MMR_POOL, MMR_OUT, ann = true),

    // mirror of TextAnalysis.proximityRerank: the shared BM25 chain's
    // top-20 pool, d100's position formulation, per-term join chain for
    // the min cover window, coverage-then-span-then-score order
    "d124_proximity_rerank" ->
      s"""WITH ${proximityCtes(BM25_TERMS)}
         |SELECT rk, doc_id, CAST(n_present AS BIGINT) AS n_present, span, score
         |FROM rr WHERE rk <= $FUSE_OUT ORDER BY rk""".stripMargin.replace("\n", " "),

    // mirror of TextAnalysis.datasetCard: the same aggregates in
    // (metric, value) long format; the one per-doc-double mean rides a
    // decimal sum, language shares reuse the d06 marker fragments
    "d129_dataset_card" -> {
      val langValues = TextAnalysis.markers.map(_._1)
        .map(l => s"('$l')").mkString(", ")
      s"""WITH core AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         |  CAST(sum(len(string_split(text, ' '))) AS DOUBLE) AS n_tokens,
         |  CAST(count(DISTINCT md5(text)) AS DOUBLE) AS n_distinct,
         |  sum(CAST(CAST(len(list_filter(string_split(text, ' '),
         |    x -> x IN ${markerIn(TextAnalysis.markers.head._2)})) AS DOUBLE)
         |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS DECIMAL(28,12)))
         |    AS sum_stop
         |  FROM documents),
         |voc AS (SELECT CAST(count(DISTINCT t) AS DOUBLE) AS v
         |  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)),
         |sc AS (SELECT doc_id, $scSelects FROM documents),
         |lg AS (SELECT $langCase AS pred_lang FROM sc),
         |lnames AS (SELECT l AS pred_lang FROM (VALUES $langValues) AS t(l)),
         |lc AS (SELECT pred_lang, CAST(count(*) AS DOUBLE) AS c FROM lg GROUP BY 1),
         |lr AS (SELECT 'lang_share_' || lnames.pred_lang AS metric,
         |    coalesce(c, CAST(0 AS DOUBLE)) / (SELECT n_docs FROM core) AS value
         |  FROM lnames LEFT JOIN lc USING (pred_lang)),
         |sr AS (SELECT 'n_docs' AS metric, n_docs AS value FROM core
         |  UNION ALL SELECT 'n_tokens', n_tokens FROM core
         |  UNION ALL SELECT 'vocab_size', v FROM voc
         |  UNION ALL SELECT 'mean_doc_tokens', n_tokens / n_docs FROM core
         |  UNION ALL SELECT 'exact_dup_frac',
         |    CAST(1 AS DOUBLE) - n_distinct / n_docs FROM core
         |  UNION ALL SELECT 'mean_stop_ratio',
         |    CAST(sum_stop AS DOUBLE) / n_docs FROM core)
         |SELECT metric, value FROM
         |  (SELECT * FROM sr UNION ALL SELECT * FROM lr)
         |ORDER BY metric""".stripMargin.replace("\n", " ")
    },

    // mirror of TextAnalysis.cardFromStore computed from the FULL
    // corpus (store built half + half via append): exact counters, the
    // d81 HLL construction over word hashes and text-digest hashes —
    // equality IS the merge-exactness proof
    "d132_card_store" -> {
      val m = 1 << CARD_P
      val L1 = 60 - CARD_P + 1
      val a = graft.operators.Dedup.hllAlphaNum(CARD_P)
      // mirrors cardFromStore.est: raw harmonic estimate, replaced by
      // the quantized-ln linear-counting form in the small range
      def hllCtes(pfx: String, src: String) =
        s"""${pfx}r AS (SELECT h % $m AS j, h // $m AS w FROM $src),
           |${pfx}rho AS (SELECT j, CASE WHEN w = 0 THEN $L1
           |  ELSE CAST($L1 - length(bin(w)) AS INT) END AS rho FROM ${pfx}r),
           |${pfx}m AS (SELECT j, max(rho) AS mj FROM ${pfx}rho GROUP BY 1),
           |${pfx}s AS (SELECT
           |  CAST(sum(CAST(1 AS BIGINT) << ($L1 - coalesce(mj, 0))) AS BIGINT) AS s,
           |  CAST(sum(CASE WHEN coalesce(mj, 0) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v
           |  FROM (SELECT CAST(range AS BIGINT) AS j FROM range(0, $m)) g
           |  LEFT JOIN ${pfx}m USING (j)),
           |${pfx}e AS (SELECT CASE
           |  WHEN v > 0 AND $a / CAST(s AS DOUBLE) <= 2.5 * $m
           |  THEN CAST($m AS DOUBLE) *
           |    (floor(ln(CAST($m AS DOUBLE) / v) * 1e8) / 1e8)
           |  ELSE $a / CAST(s AS DOUBLE) END AS est FROM ${pfx}s)""".stripMargin
      s"""WITH wv AS (SELECT ${duckHash60("t")} AS h FROM
         |  (SELECT unnest(string_split(text, ' ')) AS t FROM documents)),
         |dg AS (SELECT ${duckHash60("text")} AS h FROM documents),
         |${hllCtes("v", "wv")},
         |${hllCtes("d", "dg")},
         |core AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         |  CAST(sum(len(string_split(text, ' '))) AS DOUBLE) AS n_tokens,
         |  CAST(CAST(sum(CAST(CAST(len(list_filter(string_split(text, ' '),
         |    x -> x IN ${markerIn(TextAnalysis.markers.head._2)})) AS DOUBLE)
         |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS DECIMAL(28,12)))
         |    AS DECIMAL(38,12)) AS DOUBLE) AS sum_stop
         |  FROM documents),
         |sc AS (SELECT doc_id, $scSelects FROM documents),
         |lg AS (SELECT $langCase AS pred_lang FROM sc),
         |lr AS (SELECT 'lang_share_' || pred_lang AS metric,
         |    CAST(count(*) AS DOUBLE) / (SELECT n_docs FROM core) AS value
         |  FROM lg GROUP BY pred_lang),
         |sr AS (SELECT 'n_docs' AS metric, n_docs AS value FROM core
         |  UNION ALL SELECT 'n_tokens', n_tokens FROM core
         |  UNION ALL SELECT 'mean_doc_tokens', n_tokens / n_docs FROM core
         |  UNION ALL SELECT 'mean_stop_ratio', sum_stop / n_docs FROM core
         |  UNION ALL SELECT 'vocab_hll', est FROM ve
         |  UNION ALL SELECT 'doc_distinct_hll', est FROM de
         |  UNION ALL SELECT 'exact_dup_frac_hll',
         |    CAST(1 AS DOUBLE) - est / (SELECT n_docs FROM core) FROM de)
         |SELECT metric, value FROM
         |  (SELECT * FROM sr UNION ALL SELECT * FROM lr)
         |ORDER BY metric""".stripMargin.replace("\n", " ")
    },

    // mirror of Sampling.aliasRealize: the CASE chain generated from
    // the SAME Vose table (one Scala constant feeds both engines — the
    // d96 splitCuts pattern)
    "d134_alias_mixture" -> {
      val tab = Sampling.aliasTable(ALIAS_W)
      val k = tab.size
      val w = ALIAS_W.map(_._2).sum
      val cases = tab.map { case (j, primary, thr, alias) =>
        s"WHEN j = $j THEN (CASE WHEN v < $thr THEN '$primary' ELSE '$alias' END)"
      }.mkString(" ")
      s"""WITH s AS (SELECT CAST(range AS BIGINT) AS slot,
         |  ${duckHash60("'alias:' || CAST(range AS VARCHAR)")} AS h
         |  FROM range(0, $ALIAS_SLOTS)),
         |d AS (SELECT slot, h % $k AS j, (h // $k) % $w AS v FROM s)
         |SELECT slot, CASE $cases END AS stratum
         |FROM d ORDER BY slot""".stripMargin.replace("\n", " ")
    },

    // mirror of Packing.shardAudit from the SOURCE corpus: the d47
    // placement chain aggregated per shard, every invariant true by
    // construction — store ≡ expectation, the corruption spec proves
    // the detector fires
    "d131_shard_audit" ->
      s"""WITH $tokenOffsetCtes
         |SELECT CAST(start_token // $SHARD_BUDGET AS BIGINT) AS shard_id,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens, true AS ok
         |FROM pos GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " "),

    // mirror of Curation.sourceCap: per-source row_number over the
    // shared hash60 draw
    "d130_source_cap" ->
      s"""WITH d AS (SELECT doc_id, source,
         |  ${duckHash60("'cap:' || CAST(doc_id AS VARCHAR)")} AS k
         |  FROM documents),
         |r AS (SELECT doc_id, source,
         |  CAST(row_number() OVER (PARTITION BY source ORDER BY k, doc_id)
         |    AS BIGINT) AS rnk FROM d)
         |SELECT doc_id, source, rnk, rnk <= $SOURCE_CAP AS keep
         |FROM r ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // mirror of TextAnalysis.retrievalEval over the shared proximity
    // chain: conjunctive-coverage relevance, MRR + p@k per ranker
    "d128_retrieval_eval" -> {
      val allTerms = EVAL_TERMS
        .map(t => s"list_contains(string_split(text, ' '), '$t')")
        .mkString(" AND ")
      def evalCte(name: String, ranked: String) =
        s"""(SELECT '$name' AS ranker,
           |  CASE WHEN min(CASE WHEN relevant THEN rk END) IS NULL THEN 0.0
           |    ELSE CAST(1 AS DOUBLE) /
           |      CAST(min(CASE WHEN relevant THEN rk END) AS DOUBLE) END AS mrr,
           |  CAST(sum(CASE WHEN relevant THEN 1 ELSE 0 END) AS DOUBLE)
           |    / $FUSE_OUT AS p_at_k
           |FROM $ranked JOIN relv USING (doc_id))""".stripMargin
      s"""WITH ${proximityCtes(EVAL_TERMS)},
         |relv AS (SELECT doc_id, $allTerms AS relevant FROM documents),
         |bmr AS (SELECT doc_id, rk FROM (SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rk
         |  FROM pxsc) WHERE rk <= $FUSE_OUT),
         |pxr AS (SELECT doc_id, rk FROM rr WHERE rk <= $FUSE_OUT)
         |SELECT * FROM (${evalCte("bm25", "bmr")}
         |  UNION ALL ${evalCte("proximity", "pxr")})
         |ORDER BY ranker""".stripMargin.replace("\n", " ")
    },

    // mirror of Curation.propagateKeep over the shared d19 verdict
    // chain: embeddings semi-joined to kept parents
    "d118_crossmodal_keep" ->
      s"""SELECT e.vec_id, CAST(e.label AS BIGINT) AS label
         |FROM embeddings e JOIN ($curationKeepSql) k
         |  ON e.vec_id = k.doc_id AND k.keep
         |ORDER BY e.vec_id""".stripMargin.replace("\n", " "),

    // mirror of the d117 fusion: BM25 chain → top-20 lexical ranks,
    // e01's cosine chain for query vector 0 → top-20 dense ranks,
    // integer RRF micro-units, full-outer fuse, fused top-10
    "d117_hybrid_rrf" ->
      s"""WITH ${bm25CtesFor(BM25_TERMS, "hx")},
         |hlex AS (SELECT doc_id,
         |  CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS r
         |  FROM hxsc ORDER BY score DESC, doc_id LIMIT $FUSE_K),
         |hlex2 AS (SELECT doc_id, CAST($RRF_SCALE // (60 + r) AS BIGINT) AS s_lex FROM hlex),
         |hv AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         |hn AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM hv),
         |hq AS (SELECT e, nrm FROM hn WHERE vec_id = 0),
         |hp AS (SELECT c.vec_id AS doc_id,
         |  list_dot_product(hq.e, c.e)/(hq.nrm*c.nrm) AS cosine
         |  FROM hn c, hq WHERE c.vec_id <> 0),
         |hd AS (SELECT doc_id,
         |  CAST(row_number() OVER (ORDER BY cosine DESC, doc_id) AS BIGINT) AS rk
         |  FROM hp ORDER BY cosine DESC, doc_id LIMIT $FUSE_K),
         |hd2 AS (SELECT doc_id, CAST($RRF_SCALE // (60 + rk) AS BIGINT) AS s_dense FROM hd),
         |hf AS (SELECT doc_id,
         |  CAST(coalesce(s_lex, 0) + coalesce(s_dense, 0) AS BIGINT) AS rrf
         |  FROM hlex2 FULL JOIN hd2 USING (doc_id)),
         |ht AS (SELECT doc_id, rrf FROM hf ORDER BY rrf DESC, doc_id LIMIT $FUSE_OUT)
         |SELECT CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT) AS rk,
         |  doc_id, rrf
         |FROM ht ORDER BY rk""".stripMargin.replace("\n", " "),

    // mirror of the d116 composition: chunk CTE → keep-first dedup by
    // min composite cid per distinct text → the d17 BM25 chain scored
    // over the chunk corpus → top-k, cid decoded back
    "d116_chunk_retrieval" ->
      s"""WITH c0 AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |c1 AS (SELECT doc_id, CAST(t.i AS BIGINT) AS chunk_id,
         |  array_to_string(w[(CAST(t.i AS INTEGER) * $CHUNK_S + 1):(CAST(t.i AS INTEGER) * $CHUNK_S + $CHUNK_W)], ' ') AS text
         |  FROM c0, LATERAL unnest(range(0, ((len(w) - 1) // $CHUNK_S) + 1)) AS t(i)),
         |c2 AS (SELECT doc_id * 1024 + chunk_id AS cid, text FROM c1),
         |chdocs AS (SELECT min(cid) AS doc_id, text FROM c2 GROUP BY text),
         |${bm25CtesFor(BM25_TERMS, "ck", "chdocs")},
         |top AS (SELECT doc_id AS cid, score FROM cksc
         |  ORDER BY score DESC, doc_id LIMIT $BM25_TOPK)
         |SELECT CAST(cid // 1024 AS BIGINT) AS doc_id,
         |  CAST(cid % 1024 AS BIGINT) AS chunk_id, score
         |FROM top ORDER BY score DESC, doc_id, chunk_id"""
          .stripMargin.replace("\n", " "),

    // d111 is the SA-served construction of d41's policy — registered
    // against the SAME oracle text (covered-position equality proven
    // in Dedup.exactSubstrFromSuffixIndex's doc)
    "d111_exact_substr_sa" ->
      s"""WITH $exGramCtes, $exAnchAllCtes, $exCutSql
         |ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // mirror of Dedup.exactSubstrKeepFirst: the corpus-ordered first
    // occurrence survives, later ones anchor — same cut tail, so the
    // two policies differ ONLY in the anchoring CTE
    "d42_exact_substr_keep_first" ->
      s"""WITH $exGramCtes, $exAnchFirstCtes, $exCutSql
         |ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // mirror of Dedup.exactSubstrIncremental: increment grams inner-join
    // history's DISTINCT gram set (≡ semi), cut tail sliced to the
    // increment
    "d43_exact_substr_incremental" -> exSubstrIncrementalSql,

    // mirror of the d154 snapshot probe: the d43 chain on the
    // id-monotone 3/4 split — history's gram set at version 1, the
    // increment probed against it
    "d154_exsub_time_travel" -> {
      val cutSub = "(SELECT (max(doc_id) * 3) // 4 FROM documents)"
      s"""WITH ${exGramCtesOver("h", s"doc_id <= $cutSub")},
         |${exGramCtesOver("", s"doc_id > $cutSub")},
         |exhset AS (SELECT DISTINCT hs FROM exgh),
         |exanch AS (SELECT doc_id, pos AS s, pos + ${EXSUB_LEN - 1} AS e
         |        FROM exg JOIN exhset USING (hs)),
         |${exCutSqlFor(s"doc_id > $cutSub")}
         |ORDER BY doc_id""".stripMargin.replace("\n", " ")
    },

    // d44 shares d43's oracle VERBATIM: probing the persisted gram
    // table must be bit-identical to probing history directly
    "d44_exact_substr_indexed" -> exSubstrIncrementalSql,

    // mirror of Dedup.winnowCopyCoverage: both span sides unioned, the
    // interval-merge islands pass per doc, LEFT JOIN reinstating
    // untouched docs at 0
    "d37_copy_coverage" ->
      s"""WITH $winnowCtes,
         |$winnowPairsCtes,
         |$winnowSpansCtes,
         |sides AS (SELECT doc_a AS doc_id, start_a AS s, end_a AS e FROM wspans
         |          UNION ALL
         |          SELECT doc_b, start_a - off, end_a - off FROM wspans),
         |mg AS (SELECT *, max(e) OVER (PARTITION BY doc_id ORDER BY s, e
         |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme FROM sides),
         |br2 AS (SELECT *, CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END AS brk FROM mg),
         |is2 AS (SELECT *, sum(brk) OVER (PARTITION BY doc_id ORDER BY s, e
         |        ROWS UNBOUNDED PRECEDING) AS island FROM br2),
         |ilen AS (SELECT doc_id, island, max(e) - min(s) + 1 AS len FROM is2 GROUP BY 1, 2),
         |cov AS (SELECT doc_id, sum(len) AS n_copied FROM ilen GROUP BY 1)
         |SELECT d.doc_id, CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_words,
         |  CAST(coalesce(cov.n_copied, 0) AS BIGINT) AS n_copied,
         |  CAST(coalesce(cov.n_copied, 0) AS DOUBLE)
         |    / CAST(len(string_split(d.text, ' ')) AS DOUBLE) AS copy_frac
         |FROM documents d LEFT JOIN cov USING (doc_id)
         |ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // mirror of TextAnalysis.oovRate: d15's top-k cut (same tf desc,
    // token asc total order) as the membership set, exact rational rate
    "d31_oov_rate" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(text,' ')) AS token FROM documents),
        |c AS (SELECT token, count(*) AS tf FROM tk GROUP BY 1),
        |v AS (SELECT token FROM c ORDER BY tf DESC, token LIMIT 100),
        |agg AS (SELECT doc_id, count(*) AS n_tokens,
        |        sum(CASE WHEN token IN (SELECT token FROM v) THEN 0 ELSE 1 END) AS n_oov
        |        FROM tk GROUP BY 1)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, CAST(n_oov AS BIGINT) AS n_oov,
        |  CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS oov_rate
        |FROM agg ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // same 60-bit md5 uniform as the Spark side; the rate CASE mirrors
    // the Map fold in Sampling.stratified (unlisted strata → default)
    "d16_stratified_sample" ->
      s"""WITH $stratSampleCtes
         |SELECT doc_id, stratum, u FROM u
         |WHERE u < $rateCase
         |ORDER BY doc_id""".stripMargin.replace("\n", " "),

    "d14_repetition" ->
      s"""WITH $repetitionCtes
         |SELECT doc_id, n_tokens, dup_token_frac, top_ngram_frac
         |FROM reps ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // gram stream over ALL docs once, split by the eval predicate; the
    // LEFT JOIN reinstates train docs with no grams (shorter than n
    // tokens) as clean rows, mirroring the Spark side's train.select
    "d13_decontaminate" ->
      s"""WITH $shingleCte,
         |$contaminationCtes
         |SELECT d.doc_id, coalesce(h.n_hits, 0) AS n_hits,
         |       coalesce(h.n_hits, 0) > 0 AS contaminated
         |FROM documents d LEFT JOIN hits h USING (doc_id)
         |WHERE d.doc_id % 10 <> 0 ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // the shared d03 pair pipeline, then connected components as a
    // recursive min-reachable-label closure: reach holds every (vertex,
    // label-it-can-see) pair, min per vertex = component representative.
    // UNION (not UNION ALL) dedups the working set so the recursion
    // terminates; singletons enter via the seed row (doc_id, doc_id).
    "d12_dedup_clusters" ->
      s"""WITH RECURSIVE ${lshPairsCtes(0.5)},
         |${ccCtes("documents", "doc_id")}
         |SELECT v AS doc_id, cluster_id, count(*) OVER (PARTITION BY cluster_id) AS cluster_size
         |FROM lab ORDER BY doc_id""".stripMargin.replace("\n", " "),

    "d04_jaccard_pairs" ->
      s"""WITH ${shingleCteOver("doc_id % 2 = 0 AND")},
         |$dfCapCte,
         |card AS (SELECT doc_id, count(*) AS c FROM shc GROUP BY doc_id),
         |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
         |          FROM shc x JOIN shc y ON x.hs = y.hs AND x.doc_id < y.doc_id GROUP BY 1, 2)
         |SELECT a AS doc_a, b AS doc_b, CAST(i AS DOUBLE)/(ca.c + cb.c - i) AS jaccard
         |FROM inter JOIN card ca ON ca.doc_id = a JOIN card cb ON cb.doc_id = b
         |WHERE CAST(i AS DOUBLE)/(ca.c + cb.c - i) >= 0.4
         |ORDER BY doc_a, doc_b""".stripMargin.replace("\n", " "),

    // mirror of Dedup.containmentPairs: the d04 intersection table,
    // projected per direction and thresholded on i/|src|
    "d139_containment_pairs" ->
      s"""WITH ${shingleCteOver("doc_id % 2 = 0 AND")},
         |$dfCapCte,
         |card AS (SELECT doc_id, count(*) AS c FROM shc GROUP BY doc_id),
         |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
         |          FROM shc x JOIN shc y ON x.hs = y.hs AND x.doc_id < y.doc_id GROUP BY 1, 2),
         |bidir AS (SELECT a, b, i, ca.c AS cca, cb.c AS ccb
         |  FROM inter JOIN card ca ON ca.doc_id = a JOIN card cb ON cb.doc_id = b),
         |dir AS (SELECT a AS doc_src, b AS doc_dst,
         |    CAST(i AS DOUBLE)/cca AS containment FROM bidir
         |  UNION ALL SELECT b, a, CAST(i AS DOUBLE)/ccb FROM bidir)
         |SELECT doc_src, doc_dst, containment FROM dir
         |WHERE containment >= $CONTAIN_T
         |ORDER BY doc_src, doc_dst""".stripMargin.replace("\n", " "),

    // mirror of Curation.preferencePairs: the d07 stop-ratio score,
    // two per-source argmax/argmin windows, opposing id tie-breaks
    "d140_preference_pairs" ->
      s"""WITH s AS (SELECT doc_id, source,
         |  CAST(len(list_filter(string_split(text,' '),
         |    x -> x IN ${markerIn(graft.operators.TextAnalysis.markers.head._2)})) AS DOUBLE)
         |    / len(string_split(text,' ')) AS score FROM documents),
         |ch AS (SELECT source, doc_id AS chosen_id, score AS chosen_score FROM (
         |  SELECT *, row_number() OVER (PARTITION BY source
         |    ORDER BY score DESC, doc_id ASC) AS rn FROM s) WHERE rn = 1),
         |rj AS (SELECT source, doc_id AS rejected_id, score AS rejected_score FROM (
         |  SELECT *, row_number() OVER (PARTITION BY source
         |    ORDER BY score ASC, doc_id DESC) AS rn FROM s) WHERE rn = 1)
         |SELECT source, chosen_id, chosen_score, rejected_id, rejected_score,
         |  chosen_score - rejected_score AS margin
         |FROM ch JOIN rj USING (source) WHERE chosen_id <> rejected_id
         |ORDER BY source""".stripMargin.replace("\n", " "),

    // d04's oracle VERBATIM: prefix filtering has no false negatives,
    // so the exact join's answer IS the prefix join's answer
    "d133_ppjoin_pairs" ->
      s"""WITH ${shingleCteOver("doc_id % 2 = 0 AND")},
         |$dfCapCte,
         |card AS (SELECT doc_id, count(*) AS c FROM shc GROUP BY doc_id),
         |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
         |          FROM shc x JOIN shc y ON x.hs = y.hs AND x.doc_id < y.doc_id GROUP BY 1, 2)
         |SELECT a AS doc_a, b AS doc_b, CAST(i AS DOUBLE)/(ca.c + cb.c - i) AS jaccard
         |FROM inter JOIN card ca ON ca.doc_id = a JOIN card cb ON cb.doc_id = b
         |WHERE CAST(i AS DOUBLE)/(ca.c + cb.c - i) >= 0.4
         |ORDER BY doc_a, doc_b""".stripMargin.replace("\n", " "),

    "d05_simhash" ->
      s"""WITH tk AS (SELECT doc_id, unnest(string_split(text,' ')) AS t FROM documents),
         |h AS (SELECT doc_id, $simhashHalves FROM tk),
         |b AS (SELECT doc_id, $simhashBits FROM h GROUP BY doc_id)
         |SELECT doc_id, CAST($simhashSig AS BIGINT) AS simhash FROM b ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // mirror of Dedup.simhashHammingPairs: the d05 signature chain,
    // then 4 16-bit block keys → bucket cap → block self-join → exact
    // bit_count(xor) verify (arithmetic >> then & mask strips bit 63's
    // sign extension, identically to Spark's shiftright)
    "d30_simhash_pairs" -> {
      val nBlocks = SIMHASH_RADIUS + 1
      val bits = 64 / nBlocks
      val mask = (1L << bits) - 1
      val blockUnion = (0 until nBlocks)
        .map(b => s"SELECT doc_id, simhash, $b AS bno, (simhash >> ${b * bits}) & $mask AS bkey FROM s")
        .mkString(" UNION ALL ")
      s"""WITH tk AS (SELECT doc_id, unnest(string_split(text,' ')) AS t FROM documents),
         |h AS (SELECT doc_id, $simhashHalves FROM tk),
         |b AS (SELECT doc_id, $simhashBits FROM h GROUP BY doc_id),
         |s AS (SELECT doc_id, CAST($simhashSig AS BIGINT) AS simhash FROM b),
         |bl AS ($blockUnion),
         |blb AS (SELECT bl.* FROM bl JOIN (SELECT bno, bkey FROM bl GROUP BY bno, bkey
         |        HAVING count(*) <= $MAX_BUCKET) k USING (bno, bkey)),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |         x.simhash AS sa, y.simhash AS sb
         |         FROM blb x JOIN blb y ON x.bno = y.bno AND x.bkey = y.bkey
         |         AND x.doc_id < y.doc_id)
         |SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(sa, sb)) <= $SIMHASH_RADIUS
         |ORDER BY doc_a, doc_b""".stripMargin.replace("\n", " ")
    },

    "d06_lang_id" ->
      s"""WITH s AS (SELECT doc_id, $scSelects FROM documents)
         |SELECT doc_id, sc_en, sc_es, sc_de, sc_fr, $langCase AS pred_lang
         |FROM s ORDER BY doc_id""".stripMargin.replace("\n", " "),

    "d07_quality_score" ->
      s"""SELECT doc_id,
         | CAST(length(text) AS BIGINT) AS n_chars,
         | CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
         | CAST(length(replace(text,' ','')) AS DOUBLE) / len(string_split(text,' ')) AS avg_word_len,
         | CAST(len(list_filter(string_split(text,' '), x -> x IN ${markerIn(TextAnalysis.markers.head._2)})) AS DOUBLE)
         |   / len(string_split(text,' ')) AS stop_ratio
         |FROM documents ORDER BY doc_id""".stripMargin.replace("\n", " "),

    "d08_token_counts" ->
      """SELECT doc_id,
        | CAST(len(string_split(text,' ')) AS BIGINT) AS n_ws_tokens,
        | CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin.replace("\n", " "),

    "d09_fingerprint" ->
      """SELECT doc_id,
        | md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin.replace("\n", " "),

    "d10_embedding_neardup" ->
      s"""WITH ${embedPairsCtes(0.4)}
         |SELECT a AS vec_a, b AS vec_b, cosine FROM pairs
         |ORDER BY vec_a, vec_b""".stripMargin.replace("\n", " "),

    // d10's pair evidence through the same recursive min-label closure
    // as d12 (see that oracle's comment), seeded from the embeddings ids
    "e05_embed_clusters" -> embedClustersSql,

    // the SAME oracle string as e05 on purpose: min-label propagation
    // (e05) and two-star contraction (d22) are two algorithms for one
    // spec, so they check against one exact closure
    "d22_cc_twostar" -> embedClustersSql,

    // mirror of Curation.chunkPlan's integer window arithmetic + the
    // md5 slice digest (list_slice is INCLUSIVE [a,b] vs Spark's
    // (start, length) — hence start + len as the upper bound)
    "d23_chunk_plan" ->
      s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS w,
         |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens FROM documents),
         |c AS (SELECT doc_id, w, n_tokens,
         |  CASE WHEN n_tokens <= $CHUNK_TOKENS THEN 1
         |       ELSE (n_tokens - $CHUNK_TOKENS + ${CHUNK_STRIDE - 1}) // $CHUNK_STRIDE + 1 END AS n_chunks FROM t),
         |x AS (SELECT doc_id, w, n_tokens, unnest(range(0, n_chunks)) AS ci FROM c)
         |SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
         | CAST(ci * $CHUNK_STRIDE AS BIGINT) AS tok_start,
         | CAST(least($CHUNK_TOKENS, n_tokens - ci * $CHUNK_STRIDE) AS BIGINT) AS tok_len,
         | md5(array_to_string(list_slice(w, CAST(ci * $CHUNK_STRIDE + 1 AS BIGINT),
         |   CAST(ci * $CHUNK_STRIDE + least($CHUNK_TOKENS, n_tokens - ci * $CHUNK_STRIDE) AS BIGINT)), ' ')) AS chunk_digest
         |FROM x ORDER BY doc_id, chunk_idx""".stripMargin.replace("\n", " "),

    // mirror of Curation.cdcChunks via the unnest + window route (an
    // engine-appropriate reformulation of the same spec: chunk_idx of a
    // token = boundaries strictly before it); duckHash60 keeps the
    // boundary decision in lockstep with Dedup.hash60
    "d25_cdc_chunks" ->
      s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
         |u AS (SELECT doc_id, generate_subscripts(w,1) - 1 AS pos, unnest(w) AS tok FROM t),
         |b AS (SELECT doc_id, pos, tok,
         |  CASE WHEN ${duckHash60("tok")} % $CDC_MODULUS = 0 THEN 1 ELSE 0 END AS bnd FROM u),
         |c AS (SELECT doc_id, pos, tok, COALESCE(sum(bnd) OVER
         |  (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ci FROM b)
         |SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
         |  CAST(min(pos) AS BIGINT) AS tok_start, CAST(count(*) AS BIGINT) AS tok_len,
         |  md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_digest
         |FROM c GROUP BY doc_id, ci ORDER BY doc_id, chunk_idx""".stripMargin.replace("\n", " "),

    // mirror of Dedup.cdcIncremental: the d25 CDC chain instantiated
    // once per slice (suffix N = new docs, H = history), then df-cap →
    // digest join → per-pair counts → best match by (shared DESC,
    // hist_id ASC) → containment fraction
    "d28_cdc_incremental" -> {
      def cdcDigests(sfx: String, docFilter: String) =
        s"""t$sfx AS (SELECT doc_id, string_split(text,' ') AS w FROM documents WHERE $docFilter),
           |u$sfx AS (SELECT doc_id, generate_subscripts(w,1) - 1 AS pos, unnest(w) AS tok FROM t$sfx),
           |b$sfx AS (SELECT doc_id, pos, tok,
           |  CASE WHEN ${duckHash60("tok")} % $CDC_MODULUS = 0 THEN 1 ELSE 0 END AS bnd FROM u$sfx),
           |c$sfx AS (SELECT doc_id, pos, tok, COALESCE(sum(bnd) OVER
           |  (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ci FROM b$sfx),
           |ch$sfx AS (SELECT doc_id, md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_digest
           |           FROM c$sfx GROUP BY doc_id, ci),
           |d$sfx AS (SELECT DISTINCT doc_id, chunk_digest FROM ch$sfx)""".stripMargin
      s"""WITH ${cdcDigests("N", "doc_id % 4 = 0")},
         |${cdcDigests("H", "doc_id % 4 <> 0")},
         |hok AS (SELECT dH.doc_id AS hist_id, chunk_digest FROM dH
         |        JOIN (SELECT chunk_digest FROM dH GROUP BY chunk_digest
         |              HAVING count(*) <= $MAX_DF) k USING (chunk_digest)),
         |card AS (SELECT doc_id, count(*) AS n_chunks FROM dN GROUP BY doc_id),
         |sh AS (SELECT dN.doc_id, hok.hist_id, count(*) AS shared_chunks
         |       FROM dN JOIN hok USING (chunk_digest) GROUP BY 1, 2),
         |best AS (SELECT doc_id, hist_id, shared_chunks FROM
         |  (SELECT *, row_number() OVER (PARTITION BY doc_id
         |     ORDER BY shared_chunks DESC, hist_id ASC) AS rn FROM sh) WHERE rn = 1)
         |SELECT d.doc_id,
         |  CAST(coalesce(card.n_chunks, 0) AS BIGINT) AS n_chunks,
         |  best.hist_id AS best_match,
         |  CAST(coalesce(best.shared_chunks, 0) AS BIGINT) AS shared_chunks,
         |  coalesce(CAST(best.shared_chunks AS DOUBLE) / CAST(card.n_chunks AS DOUBLE), 0.0) AS overlap_frac,
         |  (coalesce(CAST(best.shared_chunks AS DOUBLE) / CAST(card.n_chunks AS DOUBLE), 0.0) >= 0.5) AS is_dup
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 4 = 0) d
         |LEFT JOIN card USING (doc_id) LEFT JOIN best USING (doc_id)
         |ORDER BY doc_id""".stripMargin.replace("\n", " ")
    },

    // mirror of TextAnalysis.lexicalDiversity via unnest + two GROUP BYs
    // (the run-length pass is Spark's shuffle-free reformulation; the
    // counts and each one-division double are identical)
    "d26_diversity" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |u AS (SELECT doc_id, unnest(w) AS tok FROM t),
        |c AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY 1, 2),
        |g AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |        CAST(count(*) AS BIGINT) AS n_types,
        |        CAST(sum(c*c) AS BIGINT) AS sumsq FROM c GROUP BY 1)
        |SELECT doc_id, n_tokens, n_types, sumsq,
        |  CAST(n_types AS DOUBLE)/CAST(n_tokens AS DOUBLE) AS ttr,
        |  CAST(sumsq AS DOUBLE)/(CAST(n_tokens AS DOUBLE)*CAST(n_tokens AS DOUBLE)) AS simpson
        |FROM g ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // mirror of Curation.mixSchedule: same stratum chain as d21, the
    // target CASE in MIX_TARGETS order, and the rate expression with
    // IDENTICAL association order ((budget * tot) * target) / tokens —
    // every float op sequence must match for the hash to align
    "d24_mix_schedule" -> {
      val targetCase = "CASE stratum " +
        MIX_TARGETS.map { case (s, t) => s"WHEN '$s' THEN CAST($t AS DOUBLE)" }.mkString(" ") +
        " ELSE CAST(0.0 AS DOUBLE) END"
      val rate = s"least(CAST(1.0 AS DOUBLE), CAST($MIX_BUDGET_FRAC AS DOUBLE)" +
        s" * CAST(tot_tokens AS DOUBLE) * ($targetCase) / CAST(n_tokens AS DOUBLE))"
      s"""WITH ${langStrataCtes("text, ",
             ", CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens")},
         |per AS (SELECT stratum, count(*) AS n_docs,
         |        CAST(sum(n_tokens) AS BIGINT) AS n_tokens FROM l GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens FROM per)
         |SELECT stratum, n_docs, n_tokens,
         |  $targetCase AS target_share,
         |  $rate AS rate,
         |  $rate * CAST(n_tokens AS DOUBLE) AS exp_tokens
         |FROM per CROSS JOIN tot ORDER BY stratum""".stripMargin.replace("\n", " ")
    },

    // e02's bucketed scoring with the whole corpus as the query side
    "e06_knn_graph" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm,
         |        CAST($annBucket AS BIGINT) AS bucket FROM v),
         |p AS (SELECT q.vec_id AS qid, c.vec_id AS neighbor_id,
         |        list_dot_product(q.e, c.e)/(q.nrm*c.nrm) AS cosine
         |      FROM n q JOIN n c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rk FROM p)
         |SELECT qid AS vec_id, rk, neighbor_id, cosine FROM r WHERE rk <= $KNN_K
         |ORDER BY vec_id, rk""".stripMargin.replace("\n", " "),

    // mirror of Similarity.kCenterGreedy: chained stages — mk carries
    // the running least() min-distance (same left-nesting as the Scala
    // fold), ck+1 is its (md DESC, vec_id ASC) argmax; the seed's dist
    // is the 2.0 diameter sentinel
    "e47_kcenter" -> {
      val union = s"SELECT CAST(1 AS BIGINT) AS step, vec_id, 2.0 AS dist FROM kc1" +:
        (2 to KCENTER_K).map(i =>
          s"SELECT CAST($i AS BIGINT) AS step, vec_id, md AS dist FROM kc$i")
      s"""WITH $vHeadRaw,
         |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
         |$kcenterStageCtes
         |SELECT * FROM (${union.mkString(" UNION ALL ")}) ORDER BY step"""
        .stripMargin.replace("\n", " ")
    },

    // mirror of Similarity.kmeansKcenterSeeded: the e47 exemplar chain
    // becomes the centroid table (cid = vec_id, ORDER irrelevant — the
    // asg tie-break carries the id), then the e08 two-pass Lloyd shape
    "e48_kmeans_kcenter" -> {
      val seedUnion = (1 to KCENTER_K)
        .map(i => s"SELECT vec_id, e, nrm FROM kc$i").mkString(" UNION ALL ")
      s"""WITH $vHeadRaw,
         |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
         |$kcenterStageCtes,
         |kcent AS (SELECT vec_id AS cid, e AS ce, nrm AS cn FROM ($seedUnion)),
         |${centroidAsgCtes("", "kcent")},
         |${kmeansMeanCtes("1", "cells")},
         |cent2 AS (SELECT cid, ce, sqrt(list_dot_product(ce, ce)) AS cn FROM
         |  (SELECT cell AS cid, list(val ORDER BY dim) AS ce FROM m1 GROUP BY cell)),
         |${centroidAsgCtes("2", "cent2")},
         |${kmeansMeanCtes("2", "cells2")}
         |${kmeansSelect("m2")}""".stripMargin.replace("\n", " ")
    },

    // mirror of Similarity.ivfTopKTrained: the e48 training chain
    // (k-center stages -> kcent -> two Lloyd passes) extended with the
    // final trained centroid table (cent3 from m2 — list(val ORDER BY
    // dim), the collectCentroids mirror), then e04's probe chain over
    // it
    "e71_ivf_trained" -> {
      val seedUnion = (1 to KCENTER_K)
        .map(i => s"SELECT vec_id, e, nrm FROM kc$i").mkString(" UNION ALL ")
      s"""WITH $vHeadRaw,
         |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
         |$kcenterStageCtes,
         |kcent AS (SELECT vec_id AS cid, e AS ce, nrm AS cn FROM ($seedUnion)),
         |${centroidAsgCtes("", "kcent")},
         |${kmeansMeanCtes("1", "cells")},
         |cent2 AS (SELECT cid, ce, sqrt(list_dot_product(ce, ce)) AS cn FROM
         |  (SELECT cell AS cid, list(val ORDER BY dim) AS ce FROM m1 GROUP BY cell)),
         |${centroidAsgCtes("2", "cent2")},
         |${kmeansMeanCtes("2", "cells2")},
         |cent3 AS (SELECT cid, ce, sqrt(list_dot_product(ce, ce)) AS cn FROM
         |  (SELECT cell AS cid, list(val ORDER BY dim) AS ce FROM m2 GROUP BY cell)),
         |${centroidAsgCtes("3", "cent3")},
         |probes AS (SELECT vid AS query_id, cid AS cell FROM asg3
         |  WHERE vid % 50 = 0 AND rn <= $IVF_PROBES),
         |p AS (SELECT pr.query_id, cl.vid AS neighbor_id,
         |    list_dot_product(q.e, c.e)/(q.nrm*c.nrm) AS cosine
         |  FROM probes pr JOIN cells3 cl USING (cell)
         |  JOIN n c ON c.vec_id = cl.vid JOIN n q ON q.vec_id = pr.query_id
         |  WHERE cl.vid <> pr.query_id),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rk FROM p)
         |SELECT query_id, rk, neighbor_id, cosine FROM r WHERE rk <= $PQ_K
         |ORDER BY query_id, rk""".stripMargin.replace("\n", " ")
    },

    // mirror of Similarity.ivfRecallTrained: the e71 chain as ap3 +
    // the shared recall tail
    "e72_ivf_trained_recall" -> {
      val seedUnion = (1 to KCENTER_K)
        .map(i => s"SELECT vec_id, e, nrm FROM kc$i").mkString(" UNION ALL ")
      s"""WITH $vHeadRaw,
         |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
         |$kcenterStageCtes,
         |kcent AS (SELECT vec_id AS cid, e AS ce, nrm AS cn FROM ($seedUnion)),
         |${centroidAsgCtes("", "kcent")},
         |${kmeansMeanCtes("1", "cells")},
         |cent2 AS (SELECT cid, ce, sqrt(list_dot_product(ce, ce)) AS cn FROM
         |  (SELECT cell AS cid, list(val ORDER BY dim) AS ce FROM m1 GROUP BY cell)),
         |${centroidAsgCtes("2", "cent2")},
         |${kmeansMeanCtes("2", "cells2")},
         |cent3 AS (SELECT cid, ce, sqrt(list_dot_product(ce, ce)) AS cn FROM
         |  (SELECT cell AS cid, list(val ORDER BY dim) AS ce FROM m2 GROUP BY cell)),
         |${centroidAsgCtes("3", "cent3")},
         |probes AS (SELECT vid AS query_id, cid AS cell FROM asg3
         |  WHERE vid % 50 = 0 AND rn <= $IVF_PROBES),
         |p AS (SELECT pr.query_id, cl.vid AS neighbor_id,
         |    list_dot_product(q.e, c.e)/(q.nrm*c.nrm) AS cosine
         |  FROM probes pr JOIN cells3 cl USING (cell)
         |  JOIN n c ON c.vec_id = cl.vid JOIN n q ON q.vec_id = pr.query_id
         |  WHERE cl.vid <> pr.query_id),
         |ap3 AS (SELECT query_id, neighbor_id FROM
         |  (SELECT *, row_number() OVER (PARTITION BY query_id
         |     ORDER BY cosine DESC, neighbor_id ASC) AS rk FROM p) WHERE rk <= $PQ_K),
         |$recallTailSql""".stripMargin.replace("\n", " ")
    },

    // mirror of the e77 trained-quantizer persisted serve: the e71
    // trained-centroid chain (k-center seeds -> two Lloyd passes ->
    // cent3) feeding the e26 SQ8 encode/probe chain — asg3/cells3 are
    // the book the STORE froze, so the persisted round trip must be
    // bit-identical to this in-memory composition
    "e77_ivf_trained_indexed" -> {
      val seedUnion = (1 to KCENTER_K)
        .map(i => s"SELECT vec_id, e, nrm FROM kc$i").mkString(" UNION ALL ")
      s"""WITH $vHeadRaw,
         |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
         |$kcenterStageCtes,
         |kcent AS (SELECT vec_id AS cid, e AS ce, nrm AS cn FROM ($seedUnion)),
         |${centroidAsgCtes("", "kcent")},
         |${kmeansMeanCtes("1", "cells")},
         |cent2 AS (SELECT cid, ce, sqrt(list_dot_product(ce, ce)) AS cn FROM
         |  (SELECT cell AS cid, list(val ORDER BY dim) AS ce FROM m1 GROUP BY cell)),
         |${centroidAsgCtes("2", "cent2")},
         |${kmeansMeanCtes("2", "cells2")},
         |cent3 AS (SELECT cid, ce, sqrt(list_dot_product(ce, ce)) AS cn FROM
         |  (SELECT cell AS cid, list(val ORDER BY dim) AS ce FROM m2 GROUP BY cell)),
         |${centroidAsgCtes("3", "cent3")},
         |${ivfSq8CtesAt(IVF_PROBES, "", "", "asg3", "cells3")},
         |r2 AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |        ORDER BY sq_dist ASC, neighbor_id ASC) AS BIGINT) AS rk FROM sq)
         |SELECT query_id, rk, neighbor_id, sq_dist FROM r2 WHERE rk <= $PQ_K
         |ORDER BY query_id, rk""".stripMargin.replace("\n", " ")
    },

    // mirror of Similarity.annRecallIvfSq8Indexed over the e77 store:
    // the same trained chain as ap3 + the shared recall tail
    "e78_ivf_trained_indexed_recall" -> {
      val seedUnion = (1 to KCENTER_K)
        .map(i => s"SELECT vec_id, e, nrm FROM kc$i").mkString(" UNION ALL ")
      s"""WITH $vHeadRaw,
         |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
         |$kcenterStageCtes,
         |kcent AS (SELECT vec_id AS cid, e AS ce, nrm AS cn FROM ($seedUnion)),
         |${centroidAsgCtes("", "kcent")},
         |${kmeansMeanCtes("1", "cells")},
         |cent2 AS (SELECT cid, ce, sqrt(list_dot_product(ce, ce)) AS cn FROM
         |  (SELECT cell AS cid, list(val ORDER BY dim) AS ce FROM m1 GROUP BY cell)),
         |${centroidAsgCtes("2", "cent2")},
         |${kmeansMeanCtes("2", "cells2")},
         |cent3 AS (SELECT cid, ce, sqrt(list_dot_product(ce, ce)) AS cn FROM
         |  (SELECT cell AS cid, list(val ORDER BY dim) AS ce FROM m2 GROUP BY cell)),
         |${centroidAsgCtes("3", "cent3")},
         |${ivfSq8CtesAt(IVF_PROBES, "", "", "asg3", "cells3")},
         |ap3 AS (SELECT query_id, neighbor_id FROM
         |  (SELECT *, row_number() OVER (PARTITION BY query_id
         |     ORDER BY sq_dist ASC, neighbor_id ASC) AS rk FROM sq) WHERE rk <= $PQ_K),
         |$recallTailSql""".stripMargin.replace("\n", " ")
    },

    // mirror of Similarity.pageRank: the e06 kNN CTEs become the edge
    // set, then PR_ITERS unrolled power steps of exact integer floor
    // division (m // deg contributions, damp·Σ // 100, teleport
    // literal // N) — BIGINT-exact in both engines
    "e50_pagerank" -> {
      val tele = PR_SCALE * (100 - PR_DAMP) / 100
      def prStep(i: Int): String = {
        val prev = if (i == 1) "pr0" else s"pr${i - 1}"
        s"""pr$i AS (SELECT v.vec_id,
           |  CAST($tele // nn.nv + ($PR_DAMP * coalesce(s.sm, 0)) // 100 AS BIGINT) AS m
           |  FROM v CROSS JOIN nn LEFT JOIN (
           |    SELECT eg.dst AS vec_id, sum(p.m // d.deg) AS sm
           |    FROM eg JOIN dg d USING (src) JOIN $prev p ON p.vec_id = eg.src
           |    GROUP BY 1) s ON s.vec_id = v.vec_id)"""
          .stripMargin.replace("\n", " ")
      }
      val steps = (1 to PR_ITERS).map(prStep).mkString(", ")
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm,
         |        CAST($annBucket AS BIGINT) AS bucket FROM v),
         |pp AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
         |        list_dot_product(q.e, c.e)/(q.nrm*c.nrm) AS cosine
         |      FROM n q JOIN n c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id),
         |rr AS (SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS BIGINT) AS rk FROM pp),
         |eg AS (SELECT qid AS src, nid AS dst FROM rr WHERE rk <= $KNN_K),
         |dg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM eg GROUP BY 1),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS nv FROM v),
         |pr0 AS (SELECT vec_id, CAST($PR_SCALE // nn.nv AS BIGINT) AS m
         |  FROM v CROSS JOIN nn),
         |$steps
         |SELECT vec_id, m FROM pr$PR_ITERS ORDER BY vec_id"""
        .stripMargin.replace("\n", " ")
    },

    // mirror of Similarity.pcaTopComponent: the shared covariance +
    // power-step CTEs, published scaled by max |entry|
    "e64_pca_top" -> pcaTopSql,

    // e67 shares e64's oracle VERBATIM — the registered row PROVES the
    // persisted spectral model (now grown through the sync's APPEND
    // arm: merged sufficient statistics) serves bit-identically to the
    // one-pass in-memory chain
    "e67_pca_sync" -> pcaTopSql,

    // mirror of the e79 as-of model: e64's chain over the history
    // slice — delta-merged stats at version 1 must reproduce the
    // one-pass chain on exactly that corpus cut, bit for bit
    "e79_pca_time_travel" -> pcaTopSqlFor(
      "WHERE vec_id <= (SELECT CAST(max(vec_id) * 3 // 4 AS BIGINT) FROM embeddings)"),

    // mirror of Similarity.pcaDebiasRows: the shared debias chain,
    // published at the DECIMAL(28,8) boundary (load-bearing — see
    // pcaDebiasRows doc)
    "e68_pca_debias" ->
      s"""WITH $pcaCtes,
         |$pcaDebiasCtes
         |SELECT vec_id, CAST(dim AS BIGINT) AS dim,
         |  CAST(CAST(xp AS DECIMAL(28,8)) AS DOUBLE) AS xp
         |FROM pxp ORDER BY vec_id, dim""".stripMargin.replace("\n", " "),

    // mirror of Similarity.pcaDebiasRecall: the debias chain re-
    // assembled into vectors, then e17's multi-probe LSH chain and the
    // shared recall tail over the DEBIASED space (the AFTER arm; e17
    // is the BEFORE arm on the raw embeddings)
    "e69_pca_debias_recall" ->
      s"""WITH $pcaCtes,
         |$pcaDebiasCtes,
         |rx AS (SELECT vec_id, list(xp ORDER BY dim) AS e FROM pxp GROUP BY vec_id),
         |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm,
         |        CAST($annBucket AS BIGINT) AS bucket FROM rx),
         |q AS (SELECT vec_id, e, nrm, xor(bucket, m) AS bucket
         |      FROM n, UNNEST([${(0L +: (0 until ANN_BITS).map(j => 1L << j)).mkString(",")}]) AS t(m)
         |      WHERE vec_id % 50 = 0),
         |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |        list_dot_product(q.e, c.e)/(q.nrm*c.nrm) AS cosine
         |      FROM q JOIN n c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id),
         |ap3 AS (SELECT query_id, neighbor_id FROM
         |  (SELECT *, row_number() OVER (PARTITION BY query_id
         |     ORDER BY cosine DESC, neighbor_id ASC) AS rk FROM p) WHERE rk <= $PQ_K),
         |$recallTailSql""".stripMargin.replace("\n", " "),

    // mirror of Similarity.pcaSecondComponent: the shared chain gives
    // v1 = pv{N}; normalize + Rayleigh, then deflated power steps
    "e66_pca_second" ->
      s"""WITH $pcaCtes,
         |$pcaDeflCtes,
         |qmx AS (SELECT max(abs(v)) AS m FROM qv$PCA_ITERS)
         |SELECT CAST(j AS BIGINT) AS dim,
         |  CAST(CAST(v / m AS DECIMAL(28,8)) AS DOUBLE) AS pc2
         |FROM qv$PCA_ITERS CROSS JOIN qmx ORDER BY dim"""
        .stripMargin.replace("\n", " "),

    // mirror of Similarity.pcaSpectrum: the shared deflation chain,
    // then one Rayleigh per component at the scale-24 quantization
    // (pw1 is already C·pv{N}; qwr = C·qv{N}) and the trace share
    "e73_pca_spectrum" ->
      s"""WITH $pcaCtes,
         |$pcaDeflCtes,
         |qwr AS (SELECT c.i AS j,
         |  CAST(sum(CAST(c.c * p.v AS DECIMAL(38,12))) AS DOUBLE) AS w
         |  FROM pcov c JOIN qv$PCA_ITERS p ON p.j = c.j GROUP BY 1),
         |pr1 AS (SELECT CAST(1 AS BIGINT) AS component,
         |  CAST(sum(CAST(v.v * w.w AS DECIMAL(38,24))) AS DOUBLE) /
         |  CAST(sum(CAST(v.v * v.v AS DECIMAL(38,24))) AS DOUBLE) AS lambda
         |  FROM pv$PCA_ITERS v JOIN pw1 w USING (j)),
         |pr2 AS (SELECT CAST(2 AS BIGINT) AS component,
         |  CAST(sum(CAST(v.v * w.w AS DECIMAL(38,24))) AS DOUBLE) /
         |  CAST(sum(CAST(v.v * v.v AS DECIMAL(38,24))) AS DOUBLE) AS lambda
         |  FROM qv$PCA_ITERS v JOIN qwr w USING (j)),
         |ptr AS (SELECT CAST(sum(CAST(c AS DECIMAL(38,12))) AS DOUBLE) AS trace
         |  FROM pcov WHERE i = j)
         |SELECT component, lambda, trace, lambda / trace AS share
         |FROM (SELECT * FROM pr1 UNION ALL SELECT * FROM pr2)
         |CROSS JOIN ptr ORDER BY component"""
        .stripMargin.replace("\n", " "),

    // mirror of Similarity.pcaVarianceExplained: one more matvec (pw),
    // Rayleigh quotient, trace
    "e65_pca_variance" ->
      s"""WITH $pcaCtes,
         |pw AS (SELECT c.i AS j,
         |  CAST(sum(CAST(c.c * p.v AS DECIMAL(38,12))) AS DOUBLE) AS w
         |  FROM pcov c JOIN pv$PCA_ITERS p ON p.j = c.j GROUP BY 1),
         |pr AS (SELECT
         |  CAST(sum(CAST(v.v * w.w AS DECIMAL(38,12))) AS DOUBLE) AS num,
         |  CAST(sum(CAST(v.v * v.v AS DECIMAL(38,12))) AS DOUBLE) AS den
         |  FROM pv$PCA_ITERS v JOIN pw w USING (j)),
         |ptr AS (SELECT CAST(sum(CAST(c AS DECIMAL(38,12))) AS DOUBLE) AS trace
         |  FROM pcov WHERE i = j)
         |SELECT num / den AS lambda1, trace,
         |  (num / den) / trace AS var_explained
         |FROM pr CROSS JOIN ptr""".stripMargin.replace("\n", " "),

    // mirror of Similarity.jlRerankTopK: reduced-space shortlist CTEs
    // + the exact rerank join, top-PQ_K
    "e62_jl_rerank" ->
      s"""WITH $jlRerankCtes
         |SELECT query_id, CAST(rk AS BIGINT) AS rk, neighbor_id, cosine
         |FROM rrk WHERE rk <= $PQ_K ORDER BY query_id, rk"""
        .stripMargin.replace("\n", " "),

    // mirror of Similarity.jlRecallReranked: the e62 chain as ap3, the
    // shared recall tail
    "e63_jl_rerank_recall" ->
      s"""WITH $jlRerankCtes,
         |ap3 AS (SELECT query_id, neighbor_id FROM rrk WHERE rk <= $PQ_K),
         |$recallTailSql""".stripMargin.replace("\n", " "),

    // mirror of Similarity.jlProject: the SAME Scala sign table renders
    // the list literals; list_dot_product shares the fold order
    "e60_jl_project" -> {
      val signs = graft.operators.Similarity.jlSigns(JL_M, PQ_DIMS)
      val cols = (0 until JL_M).map { i =>
        val l = signs(i).map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")
        s"list_dot_product(e, $l) AS r$i"
      }.mkString(", ")
      s"""SELECT vec_id, $cols
         |FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
         |ORDER BY vec_id""".stripMargin.replace("\n", " ")
    },

    // mirror of Similarity.jlRecall: reduced-space and full-space exact
    // top-k chains, semi-joined, one row
    "e61_jl_recall" -> {
      val signs = graft.operators.Similarity.jlSigns(JL_M, PQ_DIMS)
      val rlist = (0 until JL_M).map { i =>
        val l = signs(i).map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")
        s"list_dot_product(e, $l)"
      }.mkString("[", ", ", "]")
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         |rv AS (SELECT vec_id, $rlist AS e FROM v),
         |rn AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM rv),
         |rp AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    list_dot_product(q.e, c.e)/(q.nrm*c.nrm) AS cosine
         |  FROM rn q JOIN rn c ON q.vec_id % 50 = 0 AND c.vec_id <> q.vec_id),
         |fnd AS (SELECT query_id, neighbor_id FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, neighbor_id) AS rk FROM rp) WHERE rk <= 5),
         |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
         |xp AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    list_dot_product(q.e, c.e)/(q.nrm*c.nrm) AS cosine
         |  FROM n q JOIN n c ON q.vec_id % 50 = 0 AND c.vec_id <> q.vec_id),
         |ex AS (SELECT query_id, neighbor_id FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, neighbor_id) AS rk FROM xp) WHERE rk <= 5),
         |nqr AS (SELECT CAST(count(DISTINCT query_id) AS BIGINT) AS n_queries FROM ex),
         |ht AS (SELECT CAST(count(*) AS BIGINT) AS n_hits FROM fnd
         |  WHERE EXISTS (SELECT 1 FROM ex WHERE ex.query_id = fnd.query_id
         |    AND ex.neighbor_id = fnd.neighbor_id))
         |SELECT n_queries, n_hits,
         |  CAST(n_hits AS DOUBLE) / (5 * n_queries) AS recall
         |FROM ht CROSS JOIN nqr""".stripMargin.replace("\n", " ")
    },

    // mirror of Dedup.sourceOverlap: source-level distinct shingles,
    // one intersection table, two direction projections
    "d152_source_overlap" ->
      s"""WITH stok AS (SELECT doc_id, source, string_split(text,' ') AS w
         |  FROM documents WHERE len(string_split(text,' ')) >= 3),
         |ssh AS (SELECT DISTINCT source, array_to_string(list_slice(w, i, i+2),' ') AS s
         |  FROM stok, LATERAL unnest(range(1, len(w)-1)) AS t(i)),
         |scard AS (SELECT source, CAST(count(*) AS BIGINT) AS c FROM ssh GROUP BY 1),
         |sinter AS (SELECT x.source AS a, y.source AS b, CAST(count(*) AS BIGINT) AS i
         |  FROM ssh x JOIN ssh y ON x.s = y.s AND x.source < y.source GROUP BY 1, 2),
         |sbd AS (SELECT a, b, i, ca.c AS cca, cb.c AS ccb
         |  FROM sinter JOIN scard ca ON ca.source = a JOIN scard cb ON cb.source = b),
         |sdir AS (SELECT a AS src_a, b AS src_b, i AS n_shared,
         |    CAST(i AS DOUBLE)/cca AS overlap FROM sbd
         |  UNION ALL SELECT b, a, i, CAST(i AS DOUBLE)/ccb FROM sbd)
         |SELECT src_a, src_b, n_shared, overlap FROM sdir
         |WHERE overlap >= $SRC_OVERLAP_T
         |ORDER BY src_a, src_b""".stripMargin.replace("\n", " "),

    // mirror of TextAnalysis.countOfCounts: word counts, frequency
    // table, the c+1 self-probe; NULL c_star at the top frequency
    "d151_count_of_counts" ->
      """WITH gwc AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM
        |  (SELECT unnest(string_split(text, ' ')) AS w FROM documents) GROUP BY 1),
        |gt AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM gwc),
        |gcc AS (SELECT c, CAST(count(*) AS BIGINT) AS n_c FROM gwc GROUP BY 1)
        |SELECT a.c, a.n_c,
        |  CAST(a.c * a.n_c AS DOUBLE) / n AS mass_frac,
        |  CAST((a.c + 1) * b.n_c AS DOUBLE) / a.n_c AS c_star
        |FROM gcc a LEFT JOIN gcc b ON b.c = a.c + 1 CROSS JOIN gt
        |ORDER BY a.c""".stripMargin.replace("\n", " "),

    // mirror of Dedup.sourceBoilerplate over the shared shingle CTE;
    // the half threshold as df*2 >= n_docs (integer, no FP ceil)
    "d150_source_boilerplate" ->
      s"""WITH ${shingleCteOver("")},
         |bsrc AS (SELECT sh.doc_id, d.source, sh.s
         |  FROM sh JOIN documents d USING (doc_id)),
         |bdf AS (SELECT source, s, CAST(count(*) AS BIGINT) AS df
         |  FROM bsrc GROUP BY 1, 2),
         |bnd AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
         |  FROM documents GROUP BY 1)
         |SELECT source, n_docs, CAST(count(*) AS BIGINT) AS n_shingles,
         |  CAST(sum(CASE WHEN df * 2 >= n_docs AND df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
         |  CAST(sum(CASE WHEN df * 2 >= n_docs AND df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*) AS boiler_frac
         |FROM bdf JOIN bnd USING (source) GROUP BY source, n_docs
         |ORDER BY source""".stripMargin.replace("\n", " "),

    // mirror of Sampling.ksTwoSample: the oracle may use the plain
    // global cumulative window; deviations cross-multiplied, one divide
    "d149_ks_test" ->
      """WITH kv AS (SELECT value, event_type = 'click' AS isA FROM events
        |  WHERE event_type IN ('click', 'purchase')),
        |kp AS (SELECT value,
        |  CAST(sum(CASE WHEN isA THEN 1 ELSE 0 END) AS BIGINT) AS k1,
        |  CAST(sum(CASE WHEN isA THEN 0 ELSE 1 END) AS BIGINT) AS k2
        |  FROM kv GROUP BY 1),
        |kc AS (SELECT sum(k1) OVER (ORDER BY value) AS c1,
        |        sum(k2) OVER (ORDER BY value) AS c2 FROM kp),
        |kn AS (SELECT CAST(sum(k1) AS BIGINT) AS n1,
        |        CAST(sum(k2) AS BIGINT) AS n2 FROM kp)
        |SELECT n1, n2,
        |  CAST(max(abs(c1 * n2 - c2 * n1)) AS DOUBLE) / (n1 * n2) AS ks_d
        |FROM kc CROSS JOIN kn GROUP BY n1, n2""".stripMargin.replace("\n", " "),

    // mirror of TextAnalysis.chiSquareFeatures: distinct presence
    // pairs, integer contingency products, one divide, top-k
    "d148_chi2_features" ->
      s"""WITH ct AS (SELECT doc_id, lang = 'en' AS cls, text FROM documents),
         |cp AS (SELECT DISTINCT doc_id, cls, unnest(string_split(text, ' ')) AS w FROM ct),
         |ca AS (SELECT w, CAST(sum(CASE WHEN cls THEN 1 ELSE 0 END) AS BIGINT) AS a,
         |        CAST(sum(CASE WHEN cls THEN 0 ELSE 1 END) AS BIGINT) AS b
         |  FROM cp GROUP BY 1),
         |cn AS (SELECT CAST(sum(CASE WHEN cls THEN 1 ELSE 0 END) AS BIGINT) AS np,
         |        CAST(sum(CASE WHEN cls THEN 0 ELSE 1 END) AS BIGINT) AS nn FROM ct),
         |cs AS (SELECT w AS word, a, b,
         |  CAST((np + nn) *
         |    (a * (nn - b) - b * (np - a)) * (a * (nn - b) - b * (np - a)) AS DOUBLE) /
         |  CAST((a + b) * ((np - a) + (nn - b)) * np * nn AS DOUBLE) AS chi2
         |  FROM ca CROSS JOIN cn
         |  WHERE (a + b) * ((np - a) + (nn - b)) * np * nn <> 0)
         |SELECT CAST(row_number() OVER (ORDER BY chi2 DESC, word) AS BIGINT) AS rank,
         |  word, a, b, chi2
         |FROM (SELECT * FROM cs ORDER BY chi2 DESC, word LIMIT $PMI_K)
         |ORDER BY rank""".stripMargin.replace("\n", " "),

    // mirror of TextAnalysis.amsF2: shared-hash signs, all-integer
    // counters/squares, two final IEEE divides
    "d147_ams_f2" -> {
      val xs = (0 until AMS_EST).map { s =>
        s"CAST(sum((1 - 2 * (${duckHash60(s"'ams$s:' || w")} % 2)) * c) AS BIGINT) AS x$s"
      }.mkString(", ")
      val sq = (0 until AMS_EST).map(s => s"x$s * x$s").mkString(" + ")
      s"""WITH wcc AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM
         |  (SELECT unnest(string_split(text, ' ')) AS w FROM documents) GROUP BY 1),
         |xs AS (SELECT $xs FROM wcc),
         |exf AS (SELECT CAST(sum(c * c) AS BIGINT) AS f2_exact FROM wcc)
         |SELECT f2_exact, CAST($sq AS DOUBLE) / $AMS_EST AS f2_est,
         |  abs(CAST($sq AS DOUBLE) / $AMS_EST - f2_exact) / f2_exact AS rel_err
         |FROM xs CROSS JOIN exf""".stripMargin.replace("\n", " ")
    },

    // mirror of Similarity.annTopKFiltered: e03's multiprobe oracle
    // with the label predicate on the candidate side of the bucket join
    "e58_filtered_ann" ->
      s"""WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
         |n AS (SELECT vec_id, label, e, sqrt(list_dot_product(e, e)) AS nrm,
         |        CAST($annBucket AS BIGINT) AS bucket FROM v),
         |q AS (SELECT vec_id, e, nrm, xor(bucket, m) AS bucket
         |      FROM n, UNNEST([${(0L +: (0 until ANN_BITS).map(j => 1L << j)).mkString(",")}]) AS t(m)
         |      WHERE vec_id % 50 = 0),
         |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |        list_dot_product(q.e, c.e)/(q.nrm*c.nrm) AS cosine
         |      FROM q JOIN n c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
         |        AND c.label = $FILT_LABEL),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |        ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rk FROM p)
         |SELECT query_id, rk, neighbor_id, cosine FROM r WHERE rk <= 3
         |ORDER BY query_id, rk""".stripMargin.replace("\n", " "),

    // mirror of Similarity.filteredAnnRecall: both sides share the
    // label filter; denominator = the exact side's actual row count
    "e59_filtered_ann_recall" ->
      s"""WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
         |n AS (SELECT vec_id, label, e, sqrt(list_dot_product(e, e)) AS nrm,
         |        CAST($annBucket AS BIGINT) AS bucket FROM v),
         |q AS (SELECT vec_id, e, nrm, xor(bucket, m) AS bucket
         |      FROM n, UNNEST([${(0L +: (0 until ANN_BITS).map(j => 1L << j)).mkString(",")}]) AS t(m)
         |      WHERE vec_id % 50 = 0),
         |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |        list_dot_product(q.e, c.e)/(q.nrm*c.nrm) AS cosine
         |      FROM q JOIN n c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
         |        AND c.label = $FILT_LABEL),
         |fnd AS (SELECT query_id, neighbor_id FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, neighbor_id) AS rk FROM p) WHERE rk <= 3),
         |exq AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    list_dot_product(q.e, c.e)/(q.nrm*c.nrm) AS cosine
         |  FROM n q JOIN n c ON q.vec_id % 50 = 0 AND c.vec_id <> q.vec_id
         |    AND c.label = $FILT_LABEL),
         |ex AS (SELECT query_id, neighbor_id FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, neighbor_id) AS rk FROM exq) WHERE rk <= 3),
         |den AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM ex),
         |ht AS (SELECT CAST(count(*) AS BIGINT) AS n_hits FROM fnd
         |  WHERE EXISTS (SELECT 1 FROM ex WHERE ex.query_id = fnd.query_id
         |    AND ex.neighbor_id = fnd.neighbor_id))
         |SELECT n_exact, n_hits, CAST(n_hits AS DOUBLE) / n_exact AS recall
         |FROM ht CROSS JOIN den""".stripMargin.replace("\n", " "),

    // mirror of Similarity.graphBeamSearch: the shared nav-graph +
    // unrolled-rounds CTEs, final beam self-excluded, top-GB_K
    "e54_graph_beam" -> graphBeamSql,

    // e57 reads the persisted edge set and must answer identically —
    // e54's oracle text verbatim (the e31/d113 store convention)
    "e57_graph_beam_indexed" -> graphBeamSql,

    // mirror of Similarity.graphBeamRecall: the e54 result set
    // semi-joined against the brute-force exact top-k, one row
    "e55_graph_beam_recall" ->
      s"""WITH $graphBeamCtes,
         |${beamFoundCte("fnd", GB_ROUNDS)},
         |$beamExactCtes,
         |ht AS (SELECT CAST(count(*) AS BIGINT) AS n_hits FROM fnd
         |  WHERE EXISTS (SELECT 1 FROM ex WHERE ex.query_id = fnd.query_id
         |    AND ex.neighbor_id = fnd.neighbor_id))
         |SELECT n_queries, n_hits,
         |  CAST(n_hits AS DOUBLE) / ($GB_K * n_queries) AS recall
         |FROM ht CROSS JOIN nqr""".stripMargin.replace("\n", " "),

    // mirror of Similarity.graphBeamRecallKCenter: the e55 chain with
    // b0 scored against the e47 k-center exemplar prefix (the greedy
    // selection is prefix-stable, so 4 centers = the first 4 stages)
    "e70_graph_beam_kcenter" ->
      s"""WITH ${graphBeamCtesWith(kcenterStagesTo(GB_ENTRIES) + ", ",
        (1 to GB_ENTRIES).map(i => s"SELECT vec_id, e, nrm FROM kc$i")
          .mkString(" UNION ALL "))},
         |${beamFoundCte("fnd", GB_ROUNDS)},
         |$beamExactCtes,
         |ht AS (SELECT CAST(count(*) AS BIGINT) AS n_hits FROM fnd
         |  WHERE EXISTS (SELECT 1 FROM ex WHERE ex.query_id = fnd.query_id
         |    AND ex.neighbor_id = fnd.neighbor_id))
         |SELECT n_queries, n_hits,
         |  CAST(n_hits AS DOUBLE) / ($GB_K * n_queries) AS recall
         |FROM ht CROSS JOIN nqr""".stripMargin.replace("\n", " "),

    // mirror of Similarity.graphBeamRecallCurve: one walk, every
    // round's beam read as a prefix of the same chain
    "e56_graph_beam_curve" -> {
      val perRound = (1 to GB_ROUNDS).map { i =>
        s"""${beamFoundCte(s"f$i", i)},
           |h$i AS (SELECT CAST($i AS BIGINT) AS rounds,
           |  CAST(count(*) AS BIGINT) AS n_hits FROM f$i
           |  WHERE EXISTS (SELECT 1 FROM ex WHERE ex.query_id = f$i.query_id
           |    AND ex.neighbor_id = f$i.neighbor_id))"""
          .stripMargin.replace("\n", " ")
      }.mkString(", ")
      val unionAll = (1 to GB_ROUNDS)
        .map(i => s"SELECT rounds, n_hits FROM h$i").mkString(" UNION ALL ")
      s"""WITH $graphBeamCtes,
         |$beamExactCtes,
         |$perRound
         |SELECT rounds, n_queries, n_hits,
         |  CAST(n_hits AS DOUBLE) / ($GB_K * n_queries) AS recall
         |FROM ($unionAll) CROSS JOIN nqr ORDER BY rounds"""
        .stripMargin.replace("\n", " ")
    },

    // mirror of Similarity.semanticDedupExtremity: the e45 pair mining
    // as a pairs(a, b) CTE, the shared recursive-CTE component closure
    // (ccCtes), the e18 affinity row, argmin-affinity keeper per group
    "e49_semdedup_extremity" ->
      s"""WITH RECURSIVE $ivfAsgCtes,
         |pairs AS (SELECT a.vid AS a, b.vid AS b
         |  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vid < b.vid
         |  JOIN n na ON na.vec_id = a.vid JOIN n nb ON nb.vec_id = b.vid
         |  WHERE list_dot_product(na.e, nb.e)/(na.nrm*nb.nrm) >= $SEMDEDUP_T),
         |${ccCtes("embeddings", "vec_id")},
         |aff AS (SELECT vid, cid, cos FROM asg WHERE rn = 1)
         |SELECT l.v AS vec_id, CAST(af.cid AS BIGINT) AS cell,
         |  CAST(l.cluster_id AS BIGINT) AS group_id, af.cos AS affinity,
         |  (row_number() OVER (PARTITION BY l.cluster_id ORDER BY af.cos, l.v) = 1) AS keep
         |FROM lab l JOIN aff af ON af.vid = l.v
         |ORDER BY vec_id""".stripMargin.replace("\n", " "),

    // mirror of Similarity.semanticDedup: the shared assignment CTEs'
    // cells, self-joined within cell below the id, exact cosine
    // threshold, per-vector lower-dup count folded to the keep bit
    "e45_semdedup" ->
      s"""WITH $ivfAsgCtes,
         |sd AS (SELECT a.vid AS vec_id, CAST(count(*) AS BIGINT) AS n_lower_dups
         |  FROM cells a JOIN cells b ON a.cell = b.cell AND b.vid < a.vid
         |  JOIN n na ON na.vec_id = a.vid JOIN n nb ON nb.vec_id = b.vid
         |  WHERE list_dot_product(na.e, nb.e)/(na.nrm*nb.nrm) >= $SEMDEDUP_T
         |  GROUP BY 1)
         |SELECT c.vid AS vec_id, CAST(c.cell AS BIGINT) AS cell,
         |  CAST(coalesce(n_lower_dups, 0) AS BIGINT) AS n_lower_dups,
         |  (coalesce(n_lower_dups, 0) = 0) AS keep
         |FROM cells c LEFT JOIN sd ON sd.vec_id = c.vid
         |ORDER BY vec_id""".stripMargin.replace("\n", " "),

    // mirror of Similarity.semanticDedup(lloydIters=2): the e08 chain
    // extended one assignment — seed asg -> means m1 -> asg2 -> means
    // m2 -> cent3 -> asg3; the e45 dedup tail runs over cells3
    "e46_semdedup_trained" ->
      s"""WITH $ivfAsgCtes,
         |${kmeansMeanCtes("1", "cells")},
         |cent2 AS (SELECT cid, ce, sqrt(list_dot_product(ce, ce)) AS cn FROM
         |  (SELECT cell AS cid, list(val ORDER BY dim) AS ce FROM m1 GROUP BY cell)),
         |${centroidAsgCtes("2", "cent2")},
         |${kmeansMeanCtes("2", "cells2")},
         |cent3 AS (SELECT cid, ce, sqrt(list_dot_product(ce, ce)) AS cn FROM
         |  (SELECT cell AS cid, list(val ORDER BY dim) AS ce FROM m2 GROUP BY cell)),
         |${centroidAsgCtes("3", "cent3")},
         |sd AS (SELECT a.vid AS vec_id, CAST(count(*) AS BIGINT) AS n_lower_dups
         |  FROM cells3 a JOIN cells3 b ON a.cell = b.cell AND b.vid < a.vid
         |  JOIN n na ON na.vec_id = a.vid JOIN n nb ON nb.vec_id = b.vid
         |  WHERE list_dot_product(na.e, nb.e)/(na.nrm*nb.nrm) >= $SEMDEDUP_T
         |  GROUP BY 1)
         |SELECT c.vid AS vec_id, CAST(c.cell AS BIGINT) AS cell,
         |  CAST(coalesce(n_lower_dups, 0) AS BIGINT) AS n_lower_dups,
         |  (coalesce(n_lower_dups, 0) = 0) AS keep
         |FROM cells3 c LEFT JOIN sd ON sd.vec_id = c.vid
         |ORDER BY vec_id""".stripMargin.replace("\n", " "),

    // mirror of Similarity.centroidAffinity: the shared assignment CTEs'
    // winning row, cosine exposed as the score — asg's cos column uses
    // the same list_dot_product folds the rank already ordered by
    "e18_centroid_affinity" ->
      s"""WITH $ivfAsgCtes
         |SELECT vid AS vec_id, CAST(cid AS BIGINT) AS cell, cos AS affinity
         |FROM asg WHERE rn = 1 ORDER BY vec_id""".stripMargin.replace("\n", " "),

    // mirror of Similarity.cellOccupancy: one aggregate over the
    // assignment, share as the same double division of exact longs
    "e19_cell_occupancy" ->
      s"""WITH $ivfAsgCtes,
         |occ AS (SELECT cell, count(*) AS n FROM cells GROUP BY 1)
         |SELECT cell, CAST(n AS BIGINT) AS n_members,
         |  CAST(n AS DOUBLE) / CAST((SELECT sum(n) FROM occ) AS DOUBLE) AS share
         |FROM occ ORDER BY cell""".stripMargin.replace("\n", " "),

    // mirror of Similarity.kmeansUpdate: e04's assignment CTEs, then
    // the shared mean fold (kmeansMeanCtes doc)
    "e07_kmeans_update" ->
      s"""WITH $ivfAsgCtes,
         |${kmeansMeanCtes("1", "cells")}
         |${kmeansSelect("m1")}""".stripMargin.replace("\n", " "),

    // mirror of Similarity.kmeansIterate(2): the SAME chain iterated —
    // pass-1 means become the pass-2 centroid table (list(val ORDER BY
    // dim) rebuilds each vector; norms via the same list_dot_product
    // fold the Scala driver mirrors), then assignment + means again
    "e08_kmeans_iter" ->
      s"""WITH $ivfAsgCtes,
         |${kmeansMeanCtes("1", "cells")},
         |cent2 AS (SELECT cid, ce, sqrt(list_dot_product(ce, ce)) AS cn FROM
         |  (SELECT cell AS cid, list(val ORDER BY dim) AS ce FROM m1 GROUP BY cell)),
         |${centroidAsgCtes("2", "cent2")},
         |${kmeansMeanCtes("2", "cells2")}
         |${kmeansSelect("m2")}""".stripMargin.replace("\n", " "),

    "e01_cosine_topk" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
        |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |        list_dot_product(q.e, c.e)/(q.nrm*c.nrm) AS cosine
        |      FROM n q JOIN n c ON q.vec_id % 50 = 0 AND c.vec_id <> q.vec_id),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rk FROM p)
        |SELECT query_id, rk, neighbor_id, cosine FROM r WHERE rk <= 5
        |ORDER BY query_id, rk""".stripMargin.replace("\n", " "),

    "e02_ann_topk" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm,
         |        CAST($annBucket AS BIGINT) AS bucket FROM v),
         |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |        list_dot_product(q.e, c.e)/(q.nrm*c.nrm) AS cosine
         |      FROM n q JOIN n c ON q.bucket = c.bucket AND q.vec_id % 50 = 0 AND c.vec_id <> q.vec_id),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rk FROM p)
         |SELECT query_id, rk, neighbor_id, cosine FROM r WHERE rk <= 3
         |ORDER BY query_id, rk""".stripMargin.replace("\n", " "),

    "e03_ann_multiprobe" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm,
         |        CAST($annBucket AS BIGINT) AS bucket FROM v),
         |q AS (SELECT vec_id, e, nrm, xor(bucket, m) AS bucket
         |      FROM n, UNNEST([${(0L +: (0 until ANN_BITS).map(j => 1L << j)).mkString(",")}]) AS t(m)
         |      WHERE vec_id % 50 = 0),
         |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |        list_dot_product(q.e, c.e)/(q.nrm*c.nrm) AS cosine
         |      FROM q JOIN n c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rk FROM p)
         |SELECT query_id, rk, neighbor_id, cosine FROM r WHERE rk <= 3
         |ORDER BY query_id, rk""".stripMargin.replace("\n", " "),

    // the Bloom stage only prunes; the verified output is exact, so the
    // oracle is the plain digest semi-join semantics
    "d11_bloom_dedup" ->
      """SELECT n.doc_id,
        | EXISTS (SELECT 1 FROM documents h WHERE h.doc_id % 3 <> 0 AND sha256(h.text) = sha256(n.text)) AS is_dup
        |FROM documents n WHERE n.doc_id % 2 = 0 ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // mirror of Similarity.pqEncode over the shared assignment CTEs
    "e09_pq_codes" ->
      s"""WITH $pqCodesCtes
         |SELECT vid AS vec_id, CAST(sub AS BIGINT) AS sub, CAST(code AS BIGINT) AS code
         |FROM pcodes ORDER BY vec_id, sub""".stripMargin.replace("\n", " "),

    // mirror of Similarity.pqTrain: the shared assignment CTEs, then
    // per-(sub, code, dim) DECIMAL(28,8) means — same device as e07
    "e11_pq_train" ->
      s"""WITH $pqCodesCtes,
         |${pqTrainCtes}
         |SELECT CAST(sub AS BIGINT) AS sub, CAST(code AS BIGINT) AS code,
         |  CAST(dim AS BIGINT) AS dim, CAST(nm AS BIGINT) AS n_members, val
         |FROM mt ORDER BY sub, code, dim""".stripMargin.replace("\n", " "),

    // mirror of Similarity.pqTrainIterated(2): e12's trained-grid
    // re-assignment (tcodes — the pass-2 assignment, shared CTEs so the
    // passes cannot desynchronize), then a second copy of the SAME mean
    // fold over it
    "e11b_pq_train_iter" ->
      s"""WITH $pqCodesCtes,
         |${pqTrainCtes},
         |$pqTrainedGridCtes,
         |${pqMeanCtes("b", "tcodes")}
         |SELECT CAST(sub AS BIGINT) AS sub, CAST(code AS BIGINT) AS code,
         |  CAST(dim AS BIGINT) AS dim, CAST(nm AS BIGINT) AS n_members, val
         |FROM mtb ORDER BY sub, code, dim""".stripMargin.replace("\n", " "),

    // mirror of Similarity.pqEncodeTrained: e11's means rebuilt into
    // the trained-or-seed grid (pqTrainedGridCtes — shared with
    // e13/e14), then the SAME per-subspace assignment chains re-run
    "e12_pq_trained_codes" ->
      s"""WITH $pqCodesCtes,
         |${pqTrainCtes},
         |$pqTrainedGridCtes
         |SELECT vid AS vec_id, CAST(sub AS BIGINT) AS sub, CAST(code AS BIGINT) AS code
         |FROM tcodes ORDER BY vec_id, sub""".stripMargin.replace("\n", " "),

    // mirror of Similarity.pqAdcTopKTrained: the shared trained grid,
    // codes pivoted wide, one grid join per subspace, e10's chain
    // structure against the TRAINED centroid lists
    "e13_pq_adc_trained" ->
      s"""WITH $pqCodesCtes,
         |${pqTrainCtes},
         |$pqTrainedGridCtes,
         |q AS (SELECT vec_id AS query_id, e FROM v WHERE vec_id % 50 = 0),
         |sc AS (SELECT q.query_id, w.vid AS neighbor_id, $pqTrainedDist AS adc_dist
         |       FROM q CROSS JOIN pcw2 w $pqTrainedGridJoins
         |       WHERE w.vid <> q.query_id),
         |r2 AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |        ORDER BY adc_dist ASC, neighbor_id ASC) AS BIGINT) AS rk FROM sc)
         |SELECT query_id, rk, neighbor_id, adc_dist FROM r2 WHERE rk <= $PQ_K
         |ORDER BY query_id, rk""".stripMargin.replace("\n", " "),

    // mirror of Similarity.ivfPqTopK: the IVF chain (cells + probe
    // ranking — shared with e04/e07) stacked with the PQ trained grid;
    // candidates = probed cells' members, scoring = the trained ADC
    // chains. A corpus vector lives in ONE cell and probe cells are
    // distinct, so no dedup step (same argument as e04).
    // e32 shares e14's oracle VERBATIM: serving from the persisted
    // index must be bit-identical to the in-memory train+query chain
    "e32_ivfpq_indexed" ->
      s"""WITH $ivfAsgCtes,
         |$pqCodesAfterV,
         |${pqTrainCtes},
         |$pqTrainedGridCtes,
         |$ivfPqScCtes,
         |r2 AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |        ORDER BY adc_dist ASC, neighbor_id ASC) AS BIGINT) AS rk FROM sc)
         |SELECT query_id, rk, neighbor_id, adc_dist FROM r2 WHERE rk <= $PQ_K
         |ORDER BY query_id, rk""".stripMargin.replace("\n", " "),

    "e14_ivfpq_topk" ->
      s"""WITH $ivfAsgCtes,
         |$pqCodesAfterV,
         |${pqTrainCtes},
         |$pqTrainedGridCtes,
         |$ivfPqScCtes,
         |r2 AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |        ORDER BY adc_dist ASC, neighbor_id ASC) AS BIGINT) AS rk FROM sc)
         |SELECT query_id, rk, neighbor_id, adc_dist FROM r2 WHERE rk <= $PQ_K
         |ORDER BY query_id, rk""".stripMargin.replace("\n", " "),

    // mirror of Similarity.ivfPqRerankTopK: e14's full scoring core, the
    // ADC shortlist cut at RERANK_SHORTLIST, then exact cosine over only
    // the shortlist members and a re-rank by true cosine — the two-stage
    // retrieval production ANN engines serve
    "e20_rerank_topk" ->
      s"""WITH $ivfAsgCtes,
         |$pqCodesAfterV,
         |${pqTrainCtes},
         |$pqTrainedGridCtes,
         |$ivfPqScCtes,
         |$rerankCtes
         |SELECT query_id, rk, neighbor_id, cosine FROM rrk WHERE rk <= $PQ_K
         |ORDER BY query_id, rk""".stripMargin.replace("\n", " "),

    // mirror of Similarity.ivfPqResidualTopK: the residual chain
    // (residualScCtes — rv view, offset-seeded books, probed-cell
    // query residuals) under the same top-k tail as e14
    "e22_ivfpq_residual" ->
      s"""WITH $ivfAsgCtes,
         |$residualScCtes,
         |r2 AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |        ORDER BY adc_dist ASC, neighbor_id ASC) AS BIGINT) AS rk FROM sc)
         |SELECT query_id, rk, neighbor_id, adc_dist FROM r2 WHERE rk <= $PQ_K
         |ORDER BY query_id, rk""".stripMargin.replace("\n", " "),

    // mirror of Similarity.annRecallResidual: e22's chain as the approx
    // side of the shared recall tail — the residual construction's
    // payoff (or, on this corpus, its measured deficit) as a
    // registered number
    "e23_residual_recall" ->
      s"""WITH $ivfAsgCtes,
         |$residualScCtes,
         |ap3 AS (SELECT query_id, neighbor_id FROM
         |  (SELECT *, row_number() OVER (PARTITION BY query_id
         |     ORDER BY adc_dist ASC, neighbor_id ASC) AS rk FROM sc) WHERE rk <= $PQ_K),
         |$recallTailSql""".stripMargin.replace("\n", " "),

    // mirror of Similarity.sq8TopK: the SQ8 chain under the shared
    // top-k tail — the compression ladder's 4× rung
    // mirror of Similarity.srpTopK: the SAME driver-computed ±1 matrix
    // (Similarity.srpSignMatrix) inlined as add/subtract chains, the
    // same left-to-right association in both the projection and the
    // distance fold — bit-identical reduced coordinates
    "e35_srp_topk" ->
      s"""WITH $vHeadRaw,
         |$srpCtes,
         |r2 AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |        ORDER BY rp_dist ASC, neighbor_id ASC) AS BIGINT) AS rk FROM srp)
         |SELECT query_id, rk, neighbor_id, rp_dist FROM r2 WHERE rk <= $PQ_K
         |ORDER BY query_id, rk""".stripMargin.replace("\n", " "),

    // mirror of Similarity.annRecallSrp: e35's chain as the approx side
    // of the shared recall tail
    "e36_srp_recall" ->
      s"""WITH $vHeadRaw,
         |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
         |$srpCtes,
         |ap3 AS (SELECT query_id, neighbor_id FROM
         |  (SELECT *, row_number() OVER (PARTITION BY query_id
         |     ORDER BY rp_dist ASC, neighbor_id ASC) AS rk FROM srp) WHERE rk <= $PQ_K),
         |$recallTailSql""".stripMargin.replace("\n", " "),

    // mirror of Similarity.srpRerankTopK: e35's chain through the ONE
    // shared re-rank tail (rerankCtesOver)
    "e37_srp_rerank" ->
      s"""WITH $vHeadRaw,
         |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
         |$srpCtes,
         |${rerankCtesOver("srp", "rp_dist")}
         |SELECT query_id, rk, neighbor_id, cosine FROM rrk WHERE rk <= $PQ_K
         |ORDER BY query_id, rk""".stripMargin.replace("\n", " "),

    // mirror of Similarity.annRecallSrpReranked: e37's chain as the
    // approx side of the shared recall tail
    "e38_srp_rerank_recall" ->
      s"""WITH $vHeadRaw,
         |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
         |$srpCtes,
         |${rerankCtesOver("srp", "rp_dist")},
         |ap3 AS (SELECT query_id, neighbor_id FROM rrk WHERE rk <= $PQ_K),
         |$recallTailSql""".stripMargin.replace("\n", " "),

    // mirror of Similarity.srpBucketTopK: the block-share candidate set
    // (srpBucketCtes) under the shared top-k tail
    "e39_srp_bucket_topk" ->
      s"""WITH $vHeadRaw,
         |$srpProjCte,
         |$srpBucketCtes,
         |r2 AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |        ORDER BY rp_dist ASC, neighbor_id ASC) AS BIGINT) AS rk FROM sbk)
         |SELECT query_id, rk, neighbor_id, rp_dist FROM r2 WHERE rk <= $PQ_K
         |ORDER BY query_id, rk""".stripMargin.replace("\n", " "),

    // e41/e42 share e39's oracle VERBATIM — the registered rows PROVE
    // the persisted (and appended) index serves bit-identically to the
    // in-memory chain
    "e41_srp_indexed" ->
      s"""WITH $vHeadRaw,
         |$srpProjCte,
         |$srpBucketCtes,
         |r2 AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |        ORDER BY rp_dist ASC, neighbor_id ASC) AS BIGINT) AS rk FROM sbk)
         |SELECT query_id, rk, neighbor_id, rp_dist FROM r2 WHERE rk <= $PQ_K
         |ORDER BY query_id, rk""".stripMargin.replace("\n", " "),

    "e42_srp_appended" ->
      s"""WITH $vHeadRaw,
         |$srpProjCte,
         |$srpBucketCtes,
         |r2 AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |        ORDER BY rp_dist ASC, neighbor_id ASC) AS BIGINT) AS rk FROM sbk)
         |SELECT query_id, rk, neighbor_id, rp_dist FROM r2 WHERE rk <= $PQ_K
         |ORDER BY query_id, rk""".stripMargin.replace("\n", " "),

    // mirror of the e74 snapshot serve: e39's chain with the CANDIDATE
    // side cut to version 1's watermark (the 3/4 build cut) — queries
    // still come from the full corpus
    "e74_srp_time_travel" ->
      s"""WITH $vHeadRaw,
         |$srpProjCte,
         |${srpBucketCtesAt(SRP_RADIUS,
            "AND c.vec_id <= (SELECT (max(vec_id) * 3) // 4 FROM embeddings)")},
         |r2 AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |        ORDER BY rp_dist ASC, neighbor_id ASC) AS BIGINT) AS rk FROM sbk)
         |SELECT query_id, rk, neighbor_id, rp_dist FROM r2 WHERE rk <= $PQ_K
         |ORDER BY query_id, rk""".stripMargin.replace("\n", " "),

    "e43_srp_sync" ->
      s"""WITH $vHeadRaw,
         |$srpProjCte,
         |$srpBucketCtes,
         |r2 AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |        ORDER BY rp_dist ASC, neighbor_id ASC) AS BIGINT) AS rk FROM sbk)
         |SELECT query_id, rk, neighbor_id, rp_dist FROM r2 WHERE rk <= $PQ_K
         |ORDER BY query_id, rk""".stripMargin.replace("\n", " "),

    // mirror of Similarity.annRecallSrpBucket: e39's chain as the
    // approx side of the shared recall tail
    "e40_srp_bucket_recall" ->
      s"""WITH $vHeadRaw,
         |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
         |$srpProjCte,
         |$srpBucketCtes,
         |ap3 AS (SELECT query_id, neighbor_id FROM
         |  (SELECT *, row_number() OVER (PARTITION BY query_id
         |     ORDER BY rp_dist ASC, neighbor_id ASC) AS rk FROM sbk) WHERE rk <= $PQ_K),
         |$recallTailSql""".stripMargin.replace("\n", " "),

    "e24_sq8_topk" ->
      s"""WITH $vHeadRaw,
         |$sq8Ctes,
         |r2 AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |        ORDER BY sq_dist ASC, neighbor_id ASC) AS BIGINT) AS rk FROM sq)
         |SELECT query_id, rk, neighbor_id, sq_dist FROM r2 WHERE rk <= $PQ_K
         |ORDER BY query_id, rk""".stripMargin.replace("\n", " "),

    // mirror of Similarity.annRecallSq8: e24's chain as the approx side
    // of the shared recall tail
    "e25_sq8_recall" ->
      s"""WITH $vHeadRaw,
         |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
         |$sq8Ctes,
         |ap3 AS (SELECT query_id, neighbor_id FROM
         |  (SELECT *, row_number() OVER (PARTITION BY query_id
         |     ORDER BY sq_dist ASC, neighbor_id ASC) AS rk FROM sq) WHERE rk <= $PQ_K),
         |$recallTailSql""".stripMargin.replace("\n", " "),

    // mirror of Similarity.ivfSq8TopK: the SQ8 decode chain with
    // probe-bounded candidates — FAISS IVFSQ, the high-recall
    // cheap-scan middle ground
    "e26_ivf_sq8_topk" ->
      s"""WITH $ivfAsgCtes,
         |$ivfSq8Ctes,
         |r2 AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |        ORDER BY sq_dist ASC, neighbor_id ASC) AS BIGINT) AS rk FROM sq)
         |SELECT query_id, rk, neighbor_id, sq_dist FROM r2 WHERE rk <= $PQ_K
         |ORDER BY query_id, rk""".stripMargin.replace("\n", " "),

    // e31 shares e26's oracle VERBATIM: the persisted round trip must
    // be bit-identical to the in-memory chain — that equality IS the
    // operational claim being checked
    "e31_ivf_sq8_indexed" ->
      s"""WITH $ivfAsgCtes,
         |$ivfSq8Ctes,
         |r2 AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |        ORDER BY sq_dist ASC, neighbor_id ASC) AS BIGINT) AS rk FROM sq)
         |SELECT query_id, rk, neighbor_id, sq_dist FROM r2 WHERE rk <= $PQ_K
         |ORDER BY query_id, rk""".stripMargin.replace("\n", " "),

    // e33: the frozen-codebook rebuild — e26's chain with the
    // quantizer CTE trained on the history cut only (frozenQuantWhere);
    // seeds (vec_id < IVF_CELLS) sit inside the cut, so the centroid
    // chain is shared verbatim. Equality against the appended index is
    // the increment-algebra claim itself
    "e33_ivf_sq8_appended" ->
      s"""WITH $ivfAsgCtes,
         |${ivfSq8CtesAt(IVF_PROBES, frozenQuantWhere)},
         |r2 AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |        ORDER BY sq_dist ASC, neighbor_id ASC) AS BIGINT) AS rk FROM sq)
         |SELECT query_id, rk, neighbor_id, sq_dist FROM r2 WHERE rk <= $PQ_K
         |ORDER BY query_id, rk""".stripMargin.replace("\n", " "),

    // mirror of the e75 snapshot serve: e33's frozen-book chain with
    // the CANDIDATE side cut to version 1's watermark (the 3/4 build
    // cut) — the quantizer stays history-trained (that IS v1's book)
    "e75_ivf_time_travel" ->
      s"""WITH $ivfAsgCtes,
         |${ivfSq8CtesAt(IVF_PROBES, frozenQuantWhere,
            "AND cl.vid <= (SELECT CAST(floor(3 * max(vec_id) / 4.0) AS BIGINT) FROM embeddings)")},
         |r2 AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |        ORDER BY sq_dist ASC, neighbor_id ASC) AS BIGINT) AS rk FROM sq)
         |SELECT query_id, rk, neighbor_id, sq_dist FROM r2 WHERE rk <= $PQ_K
         |ORDER BY query_id, rk""".stripMargin.replace("\n", " "),

    // e34 shares e33's frozen-codebook oracle VERBATIM: sync-to-append
    // followed by the fresh no-op must serve exactly what a
    // hand-written append serves
    "e34_ivf_sq8_sync" ->
      s"""WITH $ivfAsgCtes,
         |${ivfSq8CtesAt(IVF_PROBES, frozenQuantWhere)},
         |r2 AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |        ORDER BY sq_dist ASC, neighbor_id ASC) AS BIGINT) AS rk FROM sq)
         |SELECT query_id, rk, neighbor_id, sq_dist FROM r2 WHERE rk <= $PQ_K
         |ORDER BY query_id, rk""".stripMargin.replace("\n", " "),

    // mirror of Similarity.annRecallIvfSq8: with near-exact codes the
    // number reads as the probe-coverage ceiling itself
    "e27_ivf_sq8_recall" ->
      s"""WITH $ivfAsgCtes,
         |$ivfSq8Ctes,
         |ap3 AS (SELECT query_id, neighbor_id FROM
         |  (SELECT *, row_number() OVER (PARTITION BY query_id
         |     ORDER BY sq_dist ASC, neighbor_id ASC) AS rk FROM sq) WHERE rk <= $PQ_K),
         |$recallTailSql""".stripMargin.replace("\n", " "),

    // mirror of Similarity.ivfSq8RerankTopK: e26's chain under the
    // shared two-stage tail (rerankCtesOver) — the SQ8-proposed
    // shortlist re-ranked by exact cosine
    "e28_ivf_sq8_rerank" ->
      s"""WITH $ivfAsgCtes,
         |$ivfSq8Ctes,
         |${rerankCtesOver("sq", "sq_dist")}
         |SELECT query_id, rk, neighbor_id, cosine FROM rrk WHERE rk <= $PQ_K
         |ORDER BY query_id, rk""".stripMargin.replace("\n", " "),

    // mirror of Similarity.annRecallIvfSq8Reranked: e28's chain as the
    // approx side of the shared recall tail — ≥ e27 pointwise, ≤ the
    // coverage ceiling by construction
    "e29_ivf_sq8_rerank_recall" ->
      s"""WITH $ivfAsgCtes,
         |$ivfSq8Ctes,
         |${rerankCtesOver("sq", "sq_dist")},
         |ap3 AS (SELECT query_id, neighbor_id FROM rrk WHERE rk <= $PQ_K),
         |$recallTailSql""".stripMargin.replace("\n", " "),

    // mirror of Similarity.ivfProbeCurve: one probeCurveBranch per
    // probe count, unioned — the tuning curve as a registered row set
    "e30_ivf_probe_curve" ->
      PROBE_CURVE.map(probeCurveBranch)
        .mkString("", " UNION ALL ", " ORDER BY probes"),

    // mirror of Similarity.srpRadiusCurve: one probeCurveBranch-shaped
    // branch per radius over the SRP bucket chain
    "e44_srp_radius_curve" ->
      SRP_RADII.map(srpRadiusBranch)
        .mkString("", " UNION ALL ", " ORDER BY radius"),

    // mirror of Similarity.annRecallReranked: e20's chain as the approx
    // side of the shared recall tail — what re-ranking buys on the same
    // index, as a registered metric (≥ e15 pointwise by construction)
    "e21_rerank_recall" ->
      s"""WITH $ivfAsgCtes,
         |$pqCodesAfterV,
         |${pqTrainCtes},
         |$pqTrainedGridCtes,
         |$ivfPqScCtes,
         |$rerankCtes,
         |ap3 AS (SELECT query_id, neighbor_id FROM rrk WHERE rk <= $PQ_K),
         |$recallTailSql""".stripMargin.replace("\n", " "),

    // mirror of Similarity.annRecall: e14's full chain (approx side)
    // stacked with e01's exact scoring (shares v/n), then the hit
    // count per query — recall as an exact n/k rational
    "e15_ann_recall" ->
      s"""WITH $ivfAsgCtes,
         |$pqCodesAfterV,
         |${pqTrainCtes},
         |$pqTrainedGridCtes,
         |$ivfPqScCtes,
         |ap3 AS (SELECT query_id, neighbor_id FROM
         |  (SELECT *, row_number() OVER (PARTITION BY query_id
         |     ORDER BY adc_dist ASC, neighbor_id ASC) AS rk FROM sc) WHERE rk <= $PQ_K),
         |$recallTailSql""".stripMargin.replace("\n", " "),

    // e15's chain verbatim with the unit-normalized v head (vHeadUnit
    // doc) — the ONLY difference between the two oracles, matching the
    // Scala side where e16 is annRecall over unitNormalized
    "e16_ann_recall_norm" ->
      s"""WITH $vHeadUnit,
         |$ivfAsgAfterV,
         |$pqCodesAfterV,
         |${pqTrainCtes},
         |$pqTrainedGridCtes,
         |$ivfPqScCtes,
         |ap3 AS (SELECT query_id, neighbor_id FROM
         |  (SELECT *, row_number() OVER (PARTITION BY query_id
         |     ORDER BY adc_dist ASC, neighbor_id ASC) AS rk FROM sc) WHERE rk <= $PQ_K),
         |$recallTailSql""".stripMargin.replace("\n", " "),

    // mirror of Similarity.annRecallLsh: e03's multi-probe chain (approx
    // side) + e01's exact scoring, then the shared recall tail — the
    // same hit-count construction as e15/e16
    "e17_ann_recall_lsh" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm,
         |        CAST($annBucket AS BIGINT) AS bucket FROM v),
         |q AS (SELECT vec_id, e, nrm, xor(bucket, m) AS bucket
         |      FROM n, UNNEST([${(0L +: (0 until ANN_BITS).map(j => 1L << j)).mkString(",")}]) AS t(m)
         |      WHERE vec_id % 50 = 0),
         |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |        list_dot_product(q.e, c.e)/(q.nrm*c.nrm) AS cosine
         |      FROM q JOIN n c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id),
         |ap3 AS (SELECT query_id, neighbor_id FROM
         |  (SELECT *, row_number() OVER (PARTITION BY query_id
         |     ORDER BY cosine DESC, neighbor_id ASC) AS rk FROM p) WHERE rk <= $PQ_K),
         |$recallTailSql""".stripMargin.replace("\n", " "),

    // mirror of Similarity.pqAdcTopK: codes pivoted wide, one pcent join
    // per subspace, the 8 per-subspace chains summed in the same
    // left-associative order as the Scala reduce
    "e10_pq_adc" -> {
      val codeCols = (1 to PQ_M)
        .map(s => s"max(CASE WHEN sub = $s THEN code END) AS c$s").mkString(", ")
      val centJoins = (1 to PQ_M)
        .map(s => s"JOIN pcent p$s ON p$s.cid = w.c$s").mkString(" ")
      val dist = (0 until PQ_M)
        .map(s => s"(${pqL2Chain("q.e", s"p${s + 1}.ce", s)})").mkString(" + ")
      s"""WITH $pqCodesCtes,
         |pcw AS (SELECT vid, $codeCols FROM pcodes GROUP BY vid),
         |q AS (SELECT vec_id AS query_id, e FROM v WHERE vec_id % 50 = 0),
         |sc AS (SELECT q.query_id, w.vid AS neighbor_id, $dist AS adc_dist
         |       FROM q CROSS JOIN pcw w $centJoins
         |       WHERE w.vid <> q.query_id),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |        ORDER BY adc_dist ASC, neighbor_id ASC) AS BIGINT) AS rk FROM sc)
         |SELECT query_id, rk, neighbor_id, adc_dist FROM r WHERE rk <= $PQ_K
         |ORDER BY query_id, rk""".stripMargin.replace("\n", " ")
    },

    "e04_ivf_ann" ->
      s"""WITH $ivfAsgCtes,
         |probes AS (SELECT vid AS query_id, cid AS cell FROM asg WHERE vid % 50 = 0 AND rn <= $IVF_PROBES),
         |p AS (SELECT pr.query_id, cl.vid AS neighbor_id,
         |        list_dot_product(q.e, c.e)/(q.nrm*c.nrm) AS cosine
         |      FROM probes pr JOIN cells cl USING (cell)
         |      JOIN n c ON c.vec_id = cl.vid JOIN n q ON q.vec_id = pr.query_id
         |      WHERE cl.vid <> pr.query_id),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rk FROM p)
         |SELECT query_id, rk, neighbor_id, cosine FROM r WHERE rk <= 3
         |ORDER BY query_id, rk""".stripMargin.replace("\n", " "),

    "m01_media_meta" ->
      """SELECT doc_id,
        | octet_length(encode(text)) AS n_bytes,
        | substr(hex(encode(text)), 1, 16) AS header_hex,
        | lang, source
        |FROM documents ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // shared stub-dims SQL + resizePlan's integer fit-in-box rule
    "m04_resize_plan" ->
      s"""WITH d AS (SELECT doc_id, $stubDimsSql FROM documents),
         |g AS (SELECT *, greatest(width, height) AS m FROM d)
         |SELECT doc_id, width, height,
         | CASE WHEN m <= $MAX_DIM THEN width  ELSE greatest(1, (width * $MAX_DIM) // m)  END AS out_w,
         | CASE WHEN m <= $MAX_DIM THEN height ELSE greatest(1, (height * $MAX_DIM) // m) END AS out_h
         |FROM g ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // mirror of Multimodal.mediaAdmission over the shared dims SQL
    "m11_media_admission" ->
      s"""WITH d AS (SELECT doc_id,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |  $stubDimsSql FROM documents),
         |g AS (SELECT *,
         |  CAST(greatest(width, height) AS DOUBLE) / least(width, height) AS aspect,
         |  least(width, height) >= 20 AS ok_dim FROM d)
         |SELECT doc_id, n_bytes, width, height, aspect, ok_dim,
         |  aspect <= 2.0 AS ok_aspect,
         |  n_bytes BETWEEN 100 AND 2000 AS ok_bytes,
         |  (ok_dim AND aspect <= 2.0 AND n_bytes BETWEEN 100 AND 2000) AS keep
         |FROM g ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // mirror of Multimodal.StubCodec's dimension arithmetic (shared SQL)
    "m02_media_decode" ->
      s"""SELECT doc_id,
         | octet_length(encode(text)) AS n_bytes,
         | $stubDimsSql
         |FROM documents ORDER BY doc_id""".stripMargin.replace("\n", " ")
  )
}
