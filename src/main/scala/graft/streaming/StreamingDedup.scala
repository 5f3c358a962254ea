package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PortableRound.pround
import graft.operators.Dedup

/** Incremental near-dedup: flag arriving documents that near-duplicate an
  * INDEXED STATIC CORPUS — the rolling-ingestion shape of a training-data
  * pipeline (a crawl snapshot is indexed once; every new batch/stream of
  * candidate documents is checked against it before admission).
  *
  * The reference has no streaming at all (SURVEY.md §2.3); this composes
  * the batch MinHash machinery ([[graft.operators.Dedup]]) with Structured
  * Streaming's stream-static join:
  *
  *   - corpus side (static, built ONCE and cached): shingle sets →
  *     64-perm minhash signature → 16 LSH band keys, exploded to
  *     (band, bkey) rows — the inverted index.
  *   - stream side (per micro-batch, pure projections): same signature +
  *     band keys; carries its shingle set through the explode so
  *     verification needs no stream-to-stream self-join.
  *   - stream-static INNER join on (band, bkey) yields candidate pairs; a
  *     true near-dup collides in MOST of the 16 bands, so the pairs are
  *     deduplicated FIRST — dropDuplicatesWithinWatermark on
  *     (new_id, corpus_id), state bounded by the watermark horizon — and
  *     only then verified ONCE with exact Jaccard over the shingle sets
  *     (same ≥ threshold bar as the batch sweep). Verifying before the
  *     dedup would re-join and re-score each pair once per colliding band.
  *   - the corpus index cache lives for the application (it IS the index);
  *     call `unpersist()` on a rebuilt index if the snapshot rotates.
  *
  * 100 TB notes: the static index is shuffled once when built; each
  * micro-batch shuffles only its own band rows to the join. Streaming state
  * exists ONLY in the final pair-dedup and is watermark-evicted.
  *
  * @param newDocs streaming (doc_id, ts, text)
  * @param corpus  static (doc_id, text, …) — the indexed snapshot
  */
object StreamingDedup {

  def minhashAgainstCorpus(
      newDocs: DataFrame,
      corpus: DataFrame,
      jaccardMin: Double = 0.5,
      watermarkDelay: String = "1 hour"): DataFrame = {
    // static index: banded corpus + shingle sets, computed once per query
    val corpusSh = Dedup.shingleSets(corpus)
      .select(col("doc_id").as("corpus_id"), col("shs").as("corpus_shs"))
      .cache()
    // the INDEX itself is cached too: a stream-static join re-evaluates
    // the static plan every micro-batch, and caching only the shingle sets
    // would re-run the signature + banding + explode over the whole corpus
    // per batch
    val corpusBands = corpusSh
      .select(col("corpus_id"), Dedup.minhashSignature(col("corpus_shs")).as("sig"))
      .select(col("corpus_id"), explode(Dedup.signatureBands(col("sig"))).as("bb"))
      .select(col("corpus_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
      .cache()

    val streamBands = Dedup.withShingleSet(newDocs) // keeps ts — no self-join
      .select(
        col("doc_id").as("new_id"),
        col("ts"),
        col("shs"),
        Dedup.minhashSignature(col("shs")).as("sig"))
      .select(
        col("new_id"), col("ts"), col("shs"),
        explode(Dedup.signatureBands(col("sig"))).as("bb"))
      .select(
        col("new_id"), col("ts"), col("shs"),
        col("bb.band").as("band"), col("bb.bkey").as("bkey"))

    streamBands
      .join(corpusBands, Seq("band", "bkey")) // stream-static join
      .select(col("new_id"), col("ts"), col("shs"), col("corpus_id"))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("new_id", "corpus_id") // before scoring
      .join(corpusSh, "corpus_id")
      .select(
        col("new_id"),
        col("ts"),
        col("corpus_id"),
        pround(
          size(array_intersect(col("shs"), col("corpus_shs"))).cast("double") /
            size(array_union(col("shs"), col("corpus_shs"))).cast("double"),
          6).as("jaccard"))
      .filter(col("jaccard") >= jaccardMin)
  }

  /** Streaming DSIR admission gate — the serve-online half of
    * [[graft.operators.Sampling.dsirVotes]]. The fitted model arrives as
    * the ≤ 512-entry bucket→vote-sign map
    * ([[graft.operators.Sampling.dsirVoteMap]]) and is embedded as a
    * LITERAL map expression, so scoring a document is one codegen'd
    * projection: tokens → unigram+bigram grams (the SAME shared feature
    * builders as the batch fit — drift between fit and serve is a
    * compile error away, not a silent skew) → bucket hash → O(1)
    * vote-vector index → integer vote sum. No join, no shuffle, no
    * streaming state: the gate
    * composes with any downstream stateful stage without spending the
    * stream's watermark/state budget, and a model refresh is just a new
    * query with a new literal (the standard blue/green swap for
    * broadcast-size models). Buckets unseen at fit time vote 0 —
    * exactly the batch rule's tie case (c_raw = c_tgt = 0). */
  def dsirAdmit(newDocs: DataFrame, votes: Map[Long, Long]): DataFrame = {
    import graft.operators.Sampling
    // reserved temp name — a caller's own "t" column (common timestamp
    // shorthand) must survive the gate untouched
    val tmp = "__graft_dsir_toks"
    val t = col(tmp)
    // dense bucket-indexed vote vector: element_at on an ARRAY literal
    // is O(1) positional indexing (a map literal would linear-scan its
    // keys on every gram — see Sampling.denseVoteArr)
    val voteArr = typedlit(Sampling.denseVoteArr(votes))
    newDocs
      .withColumn(tmp, graft.functions.NativeExprs.tokens(col("text")))
      .withColumn(
        "score_votes",
        aggregate(
          transform(
            concat(t, Sampling.dsirBigrams(t)),
            g => element_at(voteArr, (Sampling.dsirBucket(g) + 1).cast("int"))),
          lit(0L),
          (acc, v) => acc + v))
      .filter(col("score_votes") > 0)
      .drop(tmp)
  }

  /** Streaming perceptual-image admission: flag arriving image blobs
    * within Hamming ≤ `maxHamming` of ANY corpus image — the multimodal
    * ingest gate ("have we already got this picture?"), composing the
    * batch dHash machinery ([[graft.operators.Multimodal.qImageDedup]])
    * with the same stream-static join shape as
    * [[minhashAgainstCorpus]]:
    *
    *   - corpus side (static, cached once): decode → dHash → 4×14-bit
    *     band rows (THE shared [[graft.operators.Multimodal.DHashBandsExpr]]
    *     banding), plus the id→dhash table for verification. Blobs are
    *     read once at index build; only 16-byte hash rows live in the
    *     cache.
    *   - stream side: per micro-batch decode → dHash in one
    *     mapPartitions (constant memory), band explode as a pure
    *     projection — stream blobs never cross a shuffle and never
    *     enter state.
    *   - stream-static join on (band, bkey), pair-dedup FIRST
    *     (dropDuplicatesWithinWatermark, watermark-bounded state), then
    *     ONE exact bit_count verify per pair. Banding is
    *     pigeonhole-complete for maxHamming ≤ 3, so the gate's recall
    *     vs a brute-force corpus sweep is exactly 1 by construction.
    *
    * @param newImages streaming (img_id, ts, blob)
    * @param corpusBlobs static (doc_id, blob) — e.g. the stored media table
    */
  def dhashAgainstCorpus(
      newImages: DataFrame,
      corpusBlobs: DataFrame,
      maxHamming: Int = 2,
      watermarkDelay: String = "1 hour"): DataFrame = {
    // 4 bands are pigeonhole-complete only up to 3 differing bits; a
    // larger bar would silently lose recall instead of erroring
    require(maxHamming <= 3, s"4-band dHash LSH is only complete for hamming <= 3, got $maxHamming")
    import graft.operators.Multimodal
    val s = newImages.sparkSession
    import s.implicits._
    // not cached itself: its single read builds corpusBands' cache, which
    // carries corpus_dhash through to verification
    val corpusHashes = corpusBlobs
      .as[(Long, Array[Byte])]
      .mapPartitions(rows => rows.map { case (id, b) =>
        (id, Multimodal.dHash(Multimodal.PngCodec.decode(b)))
      })
      .toDF("corpus_id", "dhash")
    val corpusBands = corpusHashes
      .select(
        col("corpus_id"), col("dhash").as("corpus_dhash"),
        explode(expr(Multimodal.DHashBandsExpr)).as("bb"))
      .select(col("corpus_id"), col("corpus_dhash"), col("bb.band"), col("bb.bkey"))
      .cache()
    val streamBands = newImages
      .as[(Long, java.sql.Timestamp, Array[Byte])]
      .mapPartitions(rows => rows.map { case (id, ts, b) =>
        (id, ts, Multimodal.dHash(Multimodal.PngCodec.decode(b)))
      })
      .toDF("img_id", "ts", "dhash")
      .select(col("img_id"), col("ts"), col("dhash"), explode(expr(Multimodal.DHashBandsExpr)).as("bb"))
      .select(col("img_id"), col("ts"), col("dhash"), col("bb.band"), col("bb.bkey"))
    streamBands
      .join(corpusBands, Seq("band", "bkey")) // stream-static join
      .select(col("img_id"), col("ts"), col("dhash"), col("corpus_id"), col("corpus_dhash"))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("img_id", "corpus_id") // before scoring
      .withColumn("hamming", bit_count(col("dhash").bitwiseXOR(col("corpus_dhash"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("img_id", "ts", "corpus_id", "hamming")
  }

  /** Streaming embedding-ANN admission gate — the vector-space member of
    * this family (minhash = lexical, dHash = perceptual, CDC = span,
    * this = semantic): arriving embeddings are probed against the STORED
    * cell-partitioned IVF index exactly the way the batch q_sim_ivf /
    * q_sim_ivf_append cards probe it, flagging vectors whose cosine
    * similarity to an indexed vector clears the near-duplicate bar.
    * Admission = the stream minus the flags, same convention as
    * [[minhashAgainstCorpus]].
    *
    *   - the IVF index (corpus vectors cell-assigned against the frozen
    *     deterministic centroid sample — vec_id < nCells, the SAME
    *     recipe as the batch cards) is built and cached ONCE;
    *   - each incoming vector computes its nProbes nearest cells as one
    *     codegen'd projection over the centroid LITERALS (no join, no
    *     shuffle for the routing decision), then stream-static joins on
    *     `cell` — so a micro-batch touches only its probed cells' index
    *     rows, the nprobe/nlist cost envelope of the batch probe;
    *   - exact cosine re-rank ([[graft.functions.NativeExprs.cosineSim]],
    *     the one kernel batch and stream share) inside the probed cells;
    *     a (new, corpus) pair exists at most once per corpus cell, so the
    *     gate is STATELESS — no watermark/state budget spent.
    *
    * The approximation contract is the batch one: a near-dup hiding in an
    * unprobed cell is missed (recall bounded by nProbes/nCells routing,
    * spec-pinned), which is the accepted IVF trade.
    *
    * @param newVecs streaming (vec_id, ts, v: array&lt;float&gt;)
    * @param corpus  static (vec_id, v: array&lt;float&gt;) — the indexed snapshot
    */
  def annAgainstIndex(
      newVecs: DataFrame,
      corpus: DataFrame,
      nCells: Int = 16,
      nProbes: Int = 2,
      cosMinMicro: Long = 950000L): DataFrame = {
    import graft.functions.NativeExprs.cosineSim
    val cents: Array[(Int, Seq[Double])] = corpus
      .filter(col("vec_id") < nCells)
      .collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).map(_.toDouble)))
      .sortBy(_._1)
    def nearestCells(v: Column, n: Int): Column = {
      // (cos DESC, cid ASC) via struct sort on (cos, -cid) descending —
      // identical tiebreak to the batch cards' nearestCell/probeCells
      val scored = array(cents.map { case (cid, cv) =>
        struct(cosineSim(v, typedlit(cv)).as("cos"), lit(-cid).as("negid"))
      }.toSeq: _*)
      slice(transform(reverse(array_sort(scored)), s => -s.getField("negid")), 1, n)
    }
    val index = corpus
      .select(
        col("vec_id").as("corpus_id"),
        col("v").as("corpus_v"),
        nearestCells(col("v"), 1).getItem(0).as("cell"))
      .cache()
    newVecs
      .select(
        col("vec_id").as("new_id"), col("ts"), col("v"),
        explode(nearestCells(col("v"), nProbes)).as("cell"))
      .join(index, Seq("cell")) // stream-static; probed cells only
      .select(
        col("new_id"), col("ts"), col("corpus_id"),
        (pround(cosineSim(col("v"), col("corpus_v")), 6) * 1000000)
          .cast("long").as("cos_micro"))
      .filter(col("cos_micro") >= cosMinMicro)
  }

  /** Chunk-level revision screening against an indexed corpus: arriving
    * documents' CDC chunks ([[graft.functions.CdcChunks]] — the same
    * kernel as the batch q_cdc_chunks/q_cdc_dedup pair, so stream and
    * batch cannot drift on boundaries) are probed against the corpus's
    * substantial-chunk content-key index. A match means the new document
    * SHARES A SPAN with the corpus even when the document as a whole is
    * new — the revision/boilerplate case whole-document fingerprints
    * miss, caught here without any pairwise document comparison because
    * CDC boundaries re-synchronize across edits (shared spans hash to
    * identical chunk keys regardless of surrounding changes).
    *
    * Same scale shape as the sibling gates: the chunk-key index is built
    * and cached once (one corpus scan; ~n/64 keys, one BIGINT each);
    * each micro-batch shuffles only its own chunk keys into the
    * stream-static join; the only streaming state is the
    * watermark-evicted (doc, chunk) pair dedup.
    *
    * @param newDocs streaming (doc_id, ts, text)
    * @param corpus  static (doc_id, text, …) — the indexed snapshot
    * @param minLenCp substantial-chunk floor in code points (drops
    *                 trivial micro-chunk collisions; defaults to the
    *                 SHARED q_cdc_dedup bar)
    */
  def cdcAgainstCorpus(
      newDocs: DataFrame,
      corpus: DataFrame,
      minLenCp: Int = graft.operators.TextOps.CdcMinSubstantialCp,
      watermarkDelay: String = "1 hour"): DataFrame = {
    // chunk-key derivation = TextOps.cdcChunkKeys, the ONE definition the
    // batch gate rows use — kernel, substring recipe, and key hash
    // cannot drift between stream and corpus index
    def chunkKeys(df: DataFrame, idAs: String, extra: Seq[String]): DataFrame =
      graft.operators.TextOps.cdcChunkKeys(df, extra)
        .filter(col("len_cp") >= minLenCp)
        .select(
          (Seq(col("doc_id").as(idAs), col("len_cp"), col("chunk_key")) ++
            extra.map(col)): _*)
    // one exemplar corpus doc per distinct substantial chunk key — the
    // index a revision store keeps; built once, cached for the run
    val corpusIndex = chunkKeys(corpus, "corpus_id", Seq.empty)
      .groupBy("chunk_key")
      .agg(min("corpus_id").as("corpus_id"))
      .cache()
    chunkKeys(newDocs, "new_id", Seq("ts"))
      .join(corpusIndex, Seq("chunk_key")) // stream-static
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("new_id", "chunk_key")
      .select("new_id", "ts", "chunk_key", "len_cp", "corpus_id")
  }
}
