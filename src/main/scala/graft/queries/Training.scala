package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables
import graft.functions.Portable
import graft.operators.{Classifier, Clustering, Dedup, Graph, Multimodal, Retrieval, Similarity, TextOps, UrlOps}

/** Training-data pipeline queries over `documents` / `embeddings`, with DuckDB
  * oracles generated from the SAME [[Portable]] builders as the Spark plans —
  * the exact arithmetic (hash constants, association order, division operands)
  * is shared, so results hash-match bit-for-bit.
  *
  * The ANN gate rows are fully oracle-checked too: LSH buckets come from a
  * fixed LCG plane family that DuckDB regenerates bit-for-bit
  * ([[Portable.lshBucketsDuckCtes]]), and the IVF gate row uses the
  * deterministic stride-centroid quantizer ([[Similarity.ivfFlatTopK]]) whose
  * every stage is portable SQL. The k-means-trained IVF variant keeps its
  * recall assertion in ScalaTest (parallel centroid sums are float-order
  * nondeterministic, so no cross-engine oracle can exist for it).
  */
object Training {
  type Q = (SparkSession, String) => DataFrame

  // thresholds chosen from the measured corpus structure: near-dup docs sit at
  // J >= 0.7 with background < 0.15 (tau 0.5 in the gap); embedding pairs top
  // out near 0.6 cosine with a tail above 0.4.
  val JaccardTau  = 0.5
  val Bm25Terms: Seq[String] = Seq("hash", "join", "stream")
  val CosineTau   = 0.4
  val MaxHamming  = 3
  val NQueries    = 20
  val TopK        = 10
  /** Johnson-Lindenstrauss projection output dimension (64 -> 16, the 4x
    * compression the rp gates price in recall terms). */
  val RpDim       = 16
  /** Edit-similarity floor for the sequence-view near-dup verifier. */
  val EditSimTau  = 0.6
  /** Multiplicative-weights mixture rounds (trajectory gate, like the
    * classifier's epochs and the pagerank rounds: enough to separate, small
    * enough that the unrolled-CTE replay stays readable). */
  val MixtureIters = 5
  /** Fixed PageRank rounds for the domain-authority gate: enough for the
    * ranking to separate on a 20-node domain graph, small enough that the
    * oracle's unrolled-CTE replay stays readable. */
  val PageRankIters = 5
  /** Mixture weights for the sampling gate: full / majority / minority /
    * dropped sources, plus the default for the 16 unnamed ones. */
  val MixRates: Map[String, Double] = Map(
    "src0" -> 1.0, "src1" -> 0.7, "src2" -> 0.25, "src3" -> 0.0)
  val MixDefault = 0.5
  /** Line-dedup gate: lines shared by more than this many docs are boilerplate. */
  val LineMaxDf = 5
  /** Domain-cap gate: blocked registrable domains + per-domain contribution cap. */
  val BlockedDomains: Seq[String] = Seq("src3-example.com", "src3-example.org")
  val DomainCap = 10
  /** DSIR gate: two sources (10% of the corpus) play the high-quality target
    * slice; hashed-ngram bucket count and top-25% selection. */
  val DsirTargetSources: Seq[String] = Seq("src0", "src1")
  val DsirBuckets = 512
  val DsirKeepPct = 0.75
  /** Exact-substring-dedup gate: token window length (the near-dup clusters
    * share long passages, so plenty of windows repeat at every sf). */
  val SubstrWindow = 8
  /** Composed-pipeline gate: per-source token budget for the sampling stage
    * (~54 tokens/doc, a handful of post-curation survivors per source, so a
    * 200-token budget genuinely cuts instead of passing everything). */
  val E2eBudget = 200L
  /** Near-dup tau for the e2e chain's family stage: post-excision survivors
    * can only share sub-window (< 8-token) runs — the marker-interleaved
    * companion pairs land at J ≈ 0.45-0.51 — so the chain runs the
    * aggressive-dedup setting instead of the standalone gates' 0.5. */
  val E2eNearTau = 0.4
  /** In-chain decontamination holdout for the e2e chain: the deterministic
    * split-bucket slice at 90/10 (the contamination gates' convention) —
    * train docs with a verified cross-split near-dup drop as
    * 'contaminated'. The constructed companion pairs' buckets straddle the
    * boundary for ~1 in 5 pairs, so the arm fires at every sf. */
  val E2eDecontamPct = 90
  /** Best-fit packing gate: a 128-token budget over ~54-token docs makes
    * every bin hold 1-3 docs (fit decisions at every step), maxOpen 4 keeps
    * the eviction arm firing, and every 13th doc gets 100 pad tokens
    * appended so the oversize arm fires too. 8 shards → long enough
    * per-stream sequences that the recursive-CTE oracle replays a
    * non-trivial fit. */
  val BfBudget = 128
  val BfShards = 8
  val BfMaxOpen = 4
  /** Integer-grid k-means gate: 8 cells, 2 Lloyd iterations (the oracle
    * unrolls the identical iterations as CTEs). */
  val KmeansK = 8
  val KmeansIters = 2
  /** Chunking gate: ~54-token docs become ~3 overlapping 24-token windows
    * advancing by 16 (8-token overlap) — short, exact, and every doc
    * exercises the short-last-window arm. */
  val ChunkSize = 24
  val ChunkStride = 16
  /** Temperature-sampling gate: target draw size (40% of the sf0.01 corpus,
    * 4% at sf0.1 — the quota formula is scale-free) over a CONSTRUCTED
    * 8:4:2:1:1 skewed domain split (the natural `source` column is uniform,
    * which would make sqrt-flattening a no-op). */
  val TempTargetDocs = 200L
  val TempDomExpr =
    "CASE WHEN doc_id % 16 < 8 THEN 'd0' WHEN doc_id % 16 < 12 THEN 'd1' " +
      "WHEN doc_id % 16 < 14 THEN 'd2' WHEN doc_id % 16 < 15 THEN 'd3' ELSE 'd4' END"

  /** Frozen BPE merge list for the `text_bpe_segment` gate (rank order).
    * Training is iterative driver-side argmax (spec-gated, not
    * SQL-expressible), but APPLICATION given frozen merges is pure string
    * folding — both engines replay the same replace chain. The list is built
    * over the corpus vocabulary's frequent letters and deliberately CHAINS
    * (le -> ble, ro+w -> row, sc+an -> scan) so rank order is observable. */
  private val BpeMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("l", "e"), ("b", "le"), ("a", "ble"),
    ("r", "o"), ("ro", "w"), ("s", "c"), ("a", "n"), ("sc", "an"),
    ("v", "a"), ("a", "t"))

  /** Frozen WordPiece vocabulary for the munch gate: the BPE gate's merged
    * units plus single lowercase letters and digits — tokens carrying any
    * other character fall to [UNK], the arm the oracle must also hit. */
  val WordpieceVocab: Seq[String] =
    BpeMerges.map { case (a, b) => a + b } .distinct ++
      ('a' to 'z').map(_.toString) ++ ('0' to '9').map(_.toString)

  /** Constructed multi-line input for the Gopher-rule gate (Spark dialect;
    * [[gopherInputDuck]] is the byte-equivalent DuckDB form): four lines
    * with bullet (doc_id % 7), double-ellipsis (% 9), and symbol-spam
    * (% 17) arms on disjoint residues, plus an all-numeric short page
    * (% 23) that trips the alpha, stop-word, mean-word-length, and
    * word-count rules at once. */
  private val GopherInputExpr =
    "CASE WHEN doc_id % 23 = 0 THEN '00 11 22 33 44 55 66 77 88 99' " +
      "ELSE concat_ws('\\n', substr(text, 1, 40), " +
      "CASE WHEN doc_id % 7 = 0 THEN '- bullet item one of several' " +
      "ELSE 'plain disclaimer line for ' || source END, " +
      "CASE WHEN doc_id % 9 = 0 THEN 'trailing thought goes on...' " +
      "WHEN doc_id % 17 = 0 THEN '#tag #tag #tag #tag #tag #tag' " +
      "ELSE substr(text, 41) END, " +
      "CASE WHEN doc_id % 9 = 0 THEN 'and even the closing drifts away...' " +
      "ELSE 'closing line with the usual words' END) END"
  private def gopherInputDuck: String =
    "CASE WHEN doc_id % 23 = 0 THEN '00 11 22 33 44 55 66 77 88 99' " +
      "ELSE concat_ws(chr(10), substr(text, 1, 40), " +
      "CASE WHEN doc_id % 7 = 0 THEN '- bullet item one of several' " +
      "ELSE 'plain disclaimer line for ' || source END, " +
      "CASE WHEN doc_id % 9 = 0 THEN 'trailing thought goes on...' " +
      "WHEN doc_id % 17 = 0 THEN '#tag #tag #tag #tag #tag #tag' " +
      "ELSE substr(text, 41) END, " +
      "CASE WHEN doc_id % 9 = 0 THEN 'and even the closing drifts away...' " +
      "ELSE 'closing line with the usual words' END) END"

  /** Constructed pages for the C4 gate: line 2 lacks terminal punctuation
    * (always dropped), line 3 is the javascript arm (% 11), line 4 carries
    * the lorem-ipsum / curly-brace page-drop arms (% 13). */
  private val C4InputExpr =
    "concat_ws('\\n', substr(text, 1, 40) || '.', " +
      "'standard disclaimer for ' || source, " +
      "CASE WHEN doc_id % 11 = 0 THEN 'please enable javascript to view.' " +
      "ELSE substr(text, 41) || '.' END, " +
      "CASE WHEN doc_id % 13 = 0 THEN 'lorem ipsum dolor sit amet est.' " +
      "WHEN doc_id % 13 = 1 THEN 'config { enabled } done here.' " +
      "ELSE 'a final closing line right here.' END)"
  private def c4InputDuck: String =
    "concat_ws(chr(10), substr(text, 1, 40) || '.', " +
      "'standard disclaimer for ' || source, " +
      "CASE WHEN doc_id % 11 = 0 THEN 'please enable javascript to view.' " +
      "ELSE substr(text, 41) || '.' END, " +
      "CASE WHEN doc_id % 13 = 0 THEN 'lorem ipsum dolor sit amet est.' " +
      "WHEN doc_id % 13 = 1 THEN 'config { enabled } done here.' " +
      "ELSE 'a final closing line right here.' END)"

  /** Frozen weighted vocabulary for the unigram-LM Viterbi gate: the same
    * pieces as [[WordpieceVocab]] (so the [UNK] arm matches), with integer
    * fixed-point costs that fall with piece length — long pieces are cheap
    * per char, so Viterbi prefers them GLOBALLY where munch merely grabs
    * them locally; the two gates disagree exactly on the words where the
    * algorithms do. */
  val UnigramVocab: Seq[(String, Long)] =
    WordpieceVocab.map(p => (p, math.max(1L, 10L - 2L * p.length)))

  val queries: Map[String, Q] = Map(
    "text_bpe_segment"       -> ((s, d) => TextOps.bpeSegmentMerges(Tables.documents(s, d), BpeMerges)),
    // the OTHER subword inference algorithm: greedy longest-match-first
    // against a frozen vocab (BERT's tokenizer), integer-packed fold
    "text_wordpiece"         -> ((s, d) => TextOps.wordpieceSegment(Tables.documents(s, d), WordpieceVocab)),
    // the THIRD subword family: unigram-LM lattice Viterbi (SentencePiece
    // inference) against a frozen weighted vocab, integer-packed DP fold
    "text_unigram_segment"   -> ((s, d) => TextOps.unigramSegment(Tables.documents(s, d), UnigramVocab)),
    "text_token_stats"       -> ((s, d) => TextOps.tokenStats(Tables.documents(s, d))),
    "text_language_id"       -> ((s, d) => TextOps.languageId(Tables.documents(s, d))),
    "text_quality_score"     -> ((s, d) => TextOps.qualityScore(Tables.documents(s, d))),
    "text_corpus_stats"      -> ((s, d) => TextOps.corpusStats(Tables.documents(s, d))),
    "text_train_split"       -> ((s, d) => TextOps.trainTestSplit(Tables.documents(s, d))),
    "text_train_split_by"    -> ((s, d) => TextOps.trainTestSplitBy(Tables.documents(s, d))),
    "text_quality_filter"    -> ((s, d) => TextOps.qualityFilter(Tables.documents(s, d))),
    // per-domain quantile normalization: each source thresholds at ITS own
    // 25th percentile (a global cutoff starves lower-scoring domains)
    "text_quality_filter_domain" -> ((s, d) => TextOps.qualityFilterByDomain(Tables.documents(s, d))),
    "text_contamination"     -> ((s, d) => TextOps.contamination(Tables.documents(s, d))),
    // paraphrase-shaped (near-dup) cross-split leakage: MinHash bands
    // across the boundary, exact Jaccard verify
    "text_contamination_fuzzy" -> ((s, d) => Dedup.minhashContamination(
                                   Tables.documents(s, d), 3, tau = JaccardTau)),
    // the SERVE path: eval-set band index persisted once (frozen benchmark
    // artifact), each train batch checked against it — must equal the
    // full-scan contamination, so the oracle is the same replica
    "text_contamination_serve" -> ((s, d) => Dedup.contaminationServe(
                                   contamLake(s, d), evalSlice(s, d), trainSlice(s, d),
                                   3, JaccardTau)),
    "text_bm25_search"       -> ((s, d) => TextOps.bm25Search(Tables.documents(s, d), Bm25Terms)),
    "text_tfidf_search"      -> ((s, d) => TextOps.tfidfSearch(Tables.documents(s, d), Bm25Terms)),
    "text_pack_sequences"    -> ((s, d) => TextOps.packSequences(Tables.documents(s, d))),
    // best-fit-decreasing packing over a corpus with constructed oversize
    // docs (every 13th doc padded past the budget) — the fit itself is
    // deterministic per shard, so the oracle replays it as a recursive CTE
    "text_bestfit_pack"      -> ((s, d) => TextOps.bestFitPack(
                                   bfInput(s, d), BfBudget, BfShards, BfMaxOpen)),
    "text_bestfit_waste"     -> ((s, d) => TextOps.packingWasteReport(
                                   TextOps.bestFitPack(bfInput(s, d), BfBudget,
                                     BfShards, BfMaxOpen), BfBudget)),
    "text_heavy_hitters"     -> ((s, d) => TextOps.heavyHitterTerms(Tables.documents(s, d))),
    "text_mixture_sample"    -> ((s, d) => TextOps.mixtureSample(Tables.documents(s, d), MixRates, MixDefault)),
    // DoReMi-style multiplicative-weights mixture learning: full 5-round
    // weight trajectory, integer-exact, replayed by an unrolled CTE chain
    "text_domain_mixture"    -> ((s, d) => TextOps.domainMixtureWeights(
                                   Tables.documents(s, d), MixtureIters)),
    // the learn-then-apply composition: the final learned round's weights
    // drive the sampler IN-PLAN (no driver literal between the two halves)
    "text_mixture_learned"   -> ((s, d) => TextOps.mixtureSampleByWeights(
                                   Tables.documents(s, d),
                                   TextOps.domainMixtureWeights(Tables.documents(s, d), MixtureIters)
                                     .filter(org.apache.spark.sql.functions.col("round") === MixtureIters)
                                     .select("source", "weight"))),
    "text_token_budget"      -> ((s, d) => TextOps.tokenBudgetSample(Tables.documents(s, d), 200L)),
    // every 7th doc gets a 30-token spam run appended, so the repetition
    // thresholds trip on constructed dirt while clean docs stay under them
    "text_repetition"        -> ((s, d) => TextOps.repetitionScore(
                                   Tables.documents(s, d).withColumn("text",
                                     org.apache.spark.sql.functions.expr(
                                       "CASE WHEN doc_id % 7 = 0 THEN concat(text, repeat(' spamtok', 30)) ELSE text END")))),
    // the corpus has no sentence punctuation, so the gate CONSTRUCTS
    // boundaries deterministically (same pattern as the cleaning gates'
    // dirt): doc text + echoes behind '. ', '? ', and '! ' boundaries = 4
    // segments/doc, exercising the whole [.?!] boundary class
    "text_sentences"         -> ((s, d) => TextOps.segmentSentences(
                                   Tables.documents(s, d).withColumn("text",
                                     org.apache.spark.sql.functions.expr(
                                       "concat(text, '. ', substr(text, 1, 97), " +
                                         "'? ', substr(text, 1, 31), '! tail marker')")))),
    "dedup_exact"            -> ((s, d) => Dedup.exactDupGroups(Tables.documents(s, d))),
    "dedup_ngram_jaccard"    -> ((s, d) => Dedup.ngramJaccardPairs(Tables.documents(s, d), 3, JaccardTau)),
    "dedup_components"       -> ((s, d) => Dedup.connectedComponents(
                                   Dedup.minhashLshPairs(Tables.documents(s, d), 3, tau = JaccardTau))),
    "dedup_components_stars" -> ((s, d) => Dedup.connectedComponentsStars(
                                   Dedup.minhashLshPairs(Tables.documents(s, d), 3, tau = JaccardTau))),
    "dedup_survivors"        -> ((s, d) => Dedup.dedupSurvivors(Tables.documents(s, d), 3, JaccardTau)),
    // keep-the-best variant: one keeper per merged exact+near family by
    // max n_chars (tie: min doc_id); oracle closes the same union graph
    // with a recursive CTE and ranks keepers with a window
    "dedup_survivors_quality" -> ((s, d) => Dedup.dedupSurvivorsBy(
                                   Tables.documents(s, d), "n_chars", 3, JaccardTau)),
    "dedup_embedding_lsh"    -> ((s, d) => Dedup.embeddingNearDupLsh(Tables.embeddings(s, d), CosineTau)),
    "dedup_minhash_lsh"      -> ((s, d) => Dedup.minhashLshPairs(Tables.documents(s, d), 3, 42, 3, JaccardTau)),
    // sequence-view re-verification: banded+Jaccard-verified candidates
    // filtered by exact character Levenshtein similarity
    "dedup_edit_distance"    -> ((s, d) => Dedup.editDistancePairs(
                                   Tables.documents(s, d), 3, JaccardTau, EditSimTau)),
    "dedup_simhash"          -> ((s, d) => Dedup.simhashPairs(Tables.documents(s, d), MaxHamming)),
    "dedup_embedding_cosine" -> ((s, d) => Dedup.embeddingNearDupPairs(Tables.embeddings(s, d), CosineTau)),
    "dedup_semantic"         -> ((s, d) => Dedup.semanticDedupKeep(Tables.embeddings(s, d), CosineTau)),
    "dedup_incremental"      -> ((s, d) => Dedup.incrementalDedup(
                                   indexLake(s, d), corpusSplit(s, d), batchSplit(s, d),
                                   3, JaccardTau)),
    "dedup_substr_excise"    -> ((s, d) => Dedup.exactSubstrExcise(
                                   Tables.documents(s, d), SubstrWindow)),
    "dedup_cdc_chunks"       -> ((s, d) => Dedup.cdcSharedChunks(Tables.documents(s, d))),
    "text_unigram_surprisal" -> ((s, d) => TextOps.unigramSurprisal(Tables.documents(s, d))),
    "text_bigram_surprisal"  -> ((s, d) => TextOps.bigramSurprisal(Tables.documents(s, d))),
    "text_trigram_surprisal" -> ((s, d) => TextOps.trigramSurprisal(Tables.documents(s, d))),
    "text_chunk_windows"     -> ((s, d) => TextOps.chunkWindows(
                                   Tables.documents(s, d), ChunkSize, ChunkStride)),
    // constructed skewed domains (see TempDomExpr): sqrt-temperature quotas
    // over an 8:4:2:1:1 split, deterministic salted-hash draw order
    "text_temperature_sample" -> ((s, d) => TextOps.temperatureSample(
                                   Tables.documents(s, d).withColumn("dom",
                                     org.apache.spark.sql.functions.expr(TempDomExpr)),
                                   TempTargetDocs, "dom")),
    "text_dsir_sample"       -> ((s, d) => TextOps.dsirScores(
                                   Tables.documents(s, d),
                                   org.apache.spark.sql.functions.col("source")
                                     .isin(DsirTargetSources: _*),
                                   DsirBuckets, DsirKeepPct)),
    "text_curation"          -> ((s, d) => TextOps.curationDecisions(Tables.documents(s, d))),
    // family-level attribution: dedupSurvivorsBy quality-keeper families
    // (exact stars + banded near-dup pairs) decide survival; non-keepers
    // split into exact_dup vs near_dup, keepers run the usual filter chain
    "text_curation_families" -> ((s, d) => TextOps.curationDecisionsFamilies(
                                   Tables.documents(s, d), tau = JaccardTau)),
    // the COMPOSED curation chain over the same constructed 4-line text as
    // text_line_dedup, PLUS marker-interleaved near-dup companion pairs
    // (every 8th token -> a doc-unique marker, so no 8-token window is
    // shared — the only similarity shape that can SURVIVE the excision
    // stage — while trigram overlap stays at J ~ 0.45-0.51): line dedup ->
    // substring excision -> DSIR -> family-level curation decisions WITH
    // in-chain eval-set decontamination (cross-split near-dups drop as
    // 'contaminated') -> token budget -> pack -> shuffle shards, one gate
    // 63x2 banding (not the default 42x3): the chain's tau is 0.4 and the
    // companion pairs sit at J ~ 0.45-0.51, where the 42x3 scheme misses a
    // true pair with p ~ 2e-2 per pair — a coin flip no bitwise gate can
    // ride on; under 63x2 (same 126-hash budget) the miss is ~7e-7
    "text_curation_e2e"      -> ((s, d) => TextOps.curationPipeline(
                                   e2eInput(s, d),
                                   DsirTargetSources, LineMaxDf, SubstrWindow,
                                   DsirBuckets, DsirKeepPct,
                                   budgetPerSource = E2eBudget,
                                   nearTau = E2eNearTau,
                                   nearBands = 63, nearRowsPerBand = 2,
                                   decontamPctTrain = E2eDecontamPct)),
    "text_shuffle_shards"    -> ((s, d) => TextOps.shuffleShards(Tables.documents(s, d))),
    // the Gopher heuristic battery over constructed multi-line text: bullet,
    // ellipsis, and symbol arms injected on disjoint doc_id residues so
    // every rule trips somewhere while word-count/stop/alpha vary naturally
    "text_gopher_rules"      -> ((s, d) => TextOps.gopherRules(
                                   Tables.documents(s, d).withColumn("text",
                                     org.apache.spark.sql.functions.expr(GopherInputExpr)))),
    // C4 line/page cleaning over constructed pages: a no-terminal-punct
    // disclaimer line, a javascript arm, and lorem-ipsum / curly-brace page
    // drops on disjoint residues; minSentences 3 so the js pages fall to
    // few_sentences
    "text_c4_clean"          -> ((s, d) => TextOps.c4Clean(
                                   Tables.documents(s, d).withColumn("text",
                                     org.apache.spark.sql.functions.expr(C4InputExpr)),
                                   minSentences = 3L)),
    // the datasheet report: per-shard (source, lang) composition of the
    // kept set + per-stage attrition pooled under shard -1, over the
    // DECONTAMINATING family decision (so all six drop stages can appear)
    "text_shard_provenance"  -> ((s, d) => {
      import org.apache.spark.sql.functions.{col, expr}
      graft.plans.GraftFunctions.register(s)
      val docs = Tables.documents(s, d)
      // two consumers (kept set for sharding, the report join): materialize
      // the family decision once — lazily, so the gate's single action
      // triggers it (the e2e checkpoint rule)
      val dec = TextOps.curationDecisionsFamilies(docs, tau = JaccardTau,
        decontamPctTrain = 90).localCheckpoint(false)
      // shard is a pure per-row function of doc_id (the oracle's own `sh`
      // CTE shape): r16 deleted the docs⋈kept equi-join and the
      // shuffleShards window; r17 deletes the kept-ids LEFT JOIN too — the
      // shard rides the decision projection as when(keep, f(doc_id), -1)
      // (guide §1.2/§2.4). Bitwise-identical report, oracle unchanged.
      TextOps.shardProvenance(docs, dec,
        expr(s"cast(${Portable.shuffleKeySpark("doc_id")} % 16 as int)"))
    }),
    // the corpus has no newlines, so the gate CONSTRUCTS a 4-line document:
    // two content lines (split of the original text), one per-source
    // disclaimer (df ~ docs/source, over the cap) and one global copyright
    // line (df = corpus size) — the boilerplate shapes line dedup exists for
    "text_line_dedup"        -> ((s, d) => TextOps.dedupLines(
                                   Tables.documents(s, d).withColumn("text",
                                     org.apache.spark.sql.functions.concat_ws("\n",
                                       org.apache.spark.sql.functions.expr("substr(text, 1, 40)"),
                                       org.apache.spark.sql.functions.expr("'standard disclaimer for ' || source"),
                                       org.apache.spark.sql.functions.expr("substr(text, 41)"),
                                       org.apache.spark.sql.functions.lit("copyright corpus collection"))),
                                   LineMaxDf)),
    // constructed URL with rotating subdomain (www/cdn/bare), per-source
    // registrable domain over two TLDs, and an occasional query string —
    // exercises host/path/domain extraction, the blocklist, and the cap
    "text_domain_cap"        -> ((s, d) => UrlOps.domainCap(
                                   Tables.documents(s, d).withColumn("url",
                                     org.apache.spark.sql.functions.expr(
                                       "'https://' || (CASE WHEN doc_id % 3 = 0 THEN 'www.' WHEN doc_id % 3 = 1 THEN 'cdn.' ELSE '' END)" +
                                       " || source || '-example.' || (CASE WHEN doc_id % 2 = 0 THEN 'com' ELSE 'org' END)" +
                                       " || '/docs/' || doc_id || (CASE WHEN doc_id % 5 = 0 THEN '?ref=feed' ELSE '' END)")),
                                   BlockedDomains, DomainCap)),
    // domain-authority scoring: a deterministic doc->doc citation graph
    // (docs with id % 20 < 17 cite doc (id^2 + 3) mod N — verifiable
    // arithmetic standing in for extracted hyperlinks, same stand-in recipe
    // as syntheticMedia; the quadratic skews in-links onto few domains and
    // leaves one linked-but-never-citing domain to exercise dangling mass)
    // folded to domain level, then 5 rounds of fixed-point integer
    // PageRank; the oracle replays the iteration as 5 unrolled CTEs
    "text_domain_pagerank"   -> ((s, d) => {
      import org.apache.spark.sql.functions.{broadcast, col, count, expr, lit}
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
      val tot = docs.agg(count(lit(1)).cast("bigint").as("tot"))
      val edges = docs.filter(expr("doc_id % 20 < 17")).as("a")
        .crossJoin(broadcast(tot))
        .join(docs.select(col("doc_id").as("b_id"), col("source").as("dst")).as("b"),
          expr("(a.doc_id * a.doc_id + 3) % tot") === col("b_id"))
        .select(col("a.source").as("src"), col("dst"))
      Graph.pageRank(edges, PageRankIters)
        .select(col("node").as("domain"), col("rank"))
    }),
    "multimodal_meta"        -> ((s, d) => Multimodal.extractMeta(
                                   Multimodal.syntheticMedia(Tables.documents(s, d)))),
    // Spark ENCODES real containers (zlib IDAT via Deflater, PCM16 LE) and
    // must DECODE its own bytes back (Inflater, RIFF walk) to integer pixel/
    // sample stats; the oracle replays the deterministic value model with
    // arithmetic alone — a byte-level encode or decode bug lands on stats
    // the arithmetic twin won't produce
    "multimodal_pixels"      -> ((s, d) => Multimodal.decodeSamples(
                                   Multimodal.syntheticPixelMedia(Tables.documents(s, d)))),
    // decode real bytes, then resize (2x nearest-neighbor) / decimate (every
    // 4th sample) — the oracle replays the transformed value model with
    // index arithmetic: a stride or anchor bug cannot hash-match
    "multimodal_transform"   -> ((s, d) => Multimodal.transformSamples(
                                   Multimodal.syntheticPixelMedia(Tables.documents(s, d)))),
    // decode real PNG bytes -> dHash -> pigeonhole-banded pair generation ->
    // exact popcount verify -> per-image near-dup report; the oracle replays
    // the hash from the arithmetic pixel model and brute-forces the pairs
    "multimodal_near_dup"    -> ((s, d) => Multimodal.perceptualNearDups(
                                   Multimodal.syntheticPixelMedia(Tables.documents(s, d)), MaxHamming)),
    // decode real WAV bytes -> Haar band-energy fingerprint -> DISTINCT-
    // fingerprint contraction (audio collapses onto shared fingerprints, so
    // cohort algebra replaces the quadratic pair list) -> per-clip report;
    // the oracle replays the fingerprint from the arithmetic sample model
    // and brute-forces all pairs — the contraction must be invisible
    "multimodal_audio_near_dup" -> ((s, d) => Multimodal.audioNearDups(
                                   Multimodal.syntheticPixelMedia(Tables.documents(s, d)), MaxHamming)),
    "embed_kmeans"           -> ((s, d) => Clustering.kmeans(Tables.embeddings(s, d), KmeansK, KmeansIters)),
    // Johnson-Lindenstrauss ±1 projection (64 -> 16), exact top-k in the
    // COMPRESSED space: the oracle replays the literal sign-matrix chains,
    // so one wrong sign or one reordered addition cannot hash-match
    "embed_rp_topk"          -> ((s, d) => Similarity.bruteForceTopK(
                                   Similarity.randomProject(Tables.embeddings(s, d), RpDim),
                                   NQueries, TopK)),
    // the retrieval price of that 4x compression: projected-space exact
    // top-k vs full-space exact top-k, recall@k per query — both legs the
    // oracle-pinned brute-force path
    "embed_rp_recall"        -> ((s, d) => Similarity.rpRecall(
                                   Tables.embeddings(s, d), RpDim, NQueries, TopK)),
    // cluster-balanced corpus selection (the diversity-sampling recipe:
    // cluster the embedding space, then sqrt-temperature quotas ACROSS
    // clusters — head clusters down-weighted, tail clusters kept): a pure
    // composition of the two proven operators, oracle-checked end to end.
    // The clustering is trained ONCE per source dir and the gate times
    // SAMPLING over it — the production split (embed_kmeans times the
    // training itself), same serve-vs-build pattern as the ann_*_index gates
    "embed_cluster_sample"   -> ((s, d) => TextOps.temperatureSample(
                                   clusteredIds(s, d), TempTargetDocs, by = "cluster")),
    // prototype pruning (drop the closest quarter of each cluster, keep the
    // informative margin) SERVED from the same persisted clustering the
    // balanced-sampling gate reads — train once, consume twice
    "embed_prototype_prune"  -> ((s, d) => Clustering.prototypePrune(
                                   clusteredFull(s, d), 1L, 4L, idCol = "doc_id")),
    "ann_brute_force_topk"   -> ((s, d) => Similarity.bruteForceTopK(Tables.embeddings(s, d), NQueries, TopK)),
    "ann_lsh_topk"           -> ((s, d) => Similarity.lshAnnTopK(Tables.embeddings(s, d), NQueries, TopK)),
    "ann_recall_eval"        -> ((s, d) => Similarity.recallAtK(Tables.embeddings(s, d), NQueries, TopK)),
    "ann_ivf_topk"           -> ((s, d) => Similarity.ivfFlatTopK(Tables.embeddings(s, d), NQueries, TopK)),
    "ann_sq8_topk"           -> ((s, d) => Similarity.sq8AnnTopK(Tables.embeddings(s, d), NQueries, TopK)),
    "ann_pq_topk"            -> ((s, d) => Similarity.pqAnnTopK(Tables.embeddings(s, d), NQueries, TopK)),
    "ann_pq_index_topk"      -> ((s, d) => Similarity.queryPqIndex(
                                   s, indexLake(s, d), Tables.embeddings(s, d), "pq", NQueries, TopK)),
    "ann_ivf_index_topk"     -> ((s, d) => Similarity.queryIvfIndex(
                                   s, indexLake(s, d), Tables.embeddings(s, d), "ivf", NQueries, TopK)),
    "ann_lsh_index_topk"     -> ((s, d) => Similarity.queryLshIndex(
                                   s, indexLake(s, d), Tables.embeddings(s, d), "lsh", NQueries, TopK)),
    // metadata-scoped exact vector search: the allow-set composes an
    // in-table predicate (label <> 3) with a cross-table one (the joined
    // document is English) — both arrive as one id list, pre-filter semantics
    "ann_filtered_topk"      -> ((s, d) => Similarity.filteredTopK(
                                   Tables.embeddings(s, d), enAllowSet(s, d), NQueries, TopK)),
    // the same allow-set served through the PERSISTED IVF index: the filter
    // semi-joins probed-cell candidates only (candidate-volume cost)
    "ann_ivf_filtered_topk"  -> ((s, d) => Similarity.queryIvfIndex(
                                   s, indexLake(s, d), Tables.embeddings(s, d), "ivf",
                                   NQueries, TopK, allowed = Some(enAllowSet(s, d)))),
    "retrieval_hybrid_rrf"   -> ((s, d) => Retrieval.hybridRrf(
                                   Tables.documents(s, d), Tables.embeddings(s, d), Bm25Terms)),
    // the serve-path fusion: BM25 leg + persisted-IVF-index leg through the
    // same rrfFuse — the deployment topology's gate
    "retrieval_hybrid_rrf_index" -> ((s, d) => Retrieval.hybridRrfIndexed(
                                   s, indexLake(s, d), Tables.documents(s, d),
                                   Tables.embeddings(s, d), Bm25Terms)),
    // contrastive-training hard negatives: top-k cosine with the anchor's
    // exact/near-dup documents excluded (false-negative filtering)
    "retrieval_hard_negatives" -> ((s, d) => Retrieval.hardNegatives(
                                   Tables.documents(s, d), Tables.embeddings(s, d),
                                   NQueries, TopK, JaccardTau)),
    // the full 3-epoch training TRAJECTORY hash-checks: integer batch
    // perceptron over hashed bag-of-words, labels distilled from the
    // portable quality heuristic
    "text_quality_classifier" -> ((s, d) => Classifier.qualityPerceptron(
                                   Tables.documents(s, d))),
    // the SERVE path: weights trained ONCE per source dir into a persisted
    // parquet artifact (the ANN build/serve split), read back and scored —
    // production scores from a trained artifact, not a per-query retrain
    "text_quality_classifier_serve" -> ((s, d) => Classifier.scorePerceptron(
                                   Tables.documents(s, d), classifierWeights(s, d))))

  /** One trained weight table per source dir, landed to a temp parquet
    * layout and READ BACK by the serve gate: training is the reusable
    * persisted artifact, scoring is the served query (Verify hash-checks
    * the full train→persist→read-back→score round trip; Bench times what
    * production times). */
  private def classifierWeights(s: SparkSession, d: String): DataFrame = {
    val root = graft.core.TempLayouts.rootFor("graft_clsw_", d) { r =>
      Classifier.qualityPerceptron(Tables.documents(s, d), epochs = ServeEpochs)
        .write.mode("overwrite").parquet(s"$r/weights")
    }
    import org.apache.spark.sql.functions.col
    s.read.parquet(s"$root/weights")
      .select(col("bucket"), col(s"w$ServeEpochs").as("w"))
  }

  /** Epochs the serve artifact is trained for — the served weight column is
    * the LAST epoch's (`w$ServeEpochs`), so the trainer call and the
    * read-back column stay coupled through this one constant instead of a
    * hardcoded "w3" silently tracking qualityPerceptron's default. */
  private val ServeEpochs = 3

  /** The filtered-search gates' shared allow-set: embeddings whose label
    * survives AND whose document is English — one in-table predicate, one
    * cross-table, both pushed to their own table's scan. */
  private def enAllowSet(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    Tables.embeddings(s, d).filter(col("label") =!= 3).select("vec_id")
      .join(Tables.documents(s, d).filter(col("lang") === "en")
        .select(col("doc_id").as("vec_id")), "vec_id")
  }

  /** One persisted ANN index set (PQ + IVF + LSH) per source dir (built on first
    * use, then SERVED): the gates' query paths read the index tables back
    * from the lake every call, so Verify hash-checks the full
    * write→read-back→query round trip while Bench times what production
    * times — serving from a prebuilt index, not rebuilding it per query.
    * Thread-safe: Verify/Bench run queries sequentially, but keep the map
    * synchronized for safety. */
  /** One trained cluster assignment per source dir (vec_id -> cluster),
    * landed to a temp parquet layout and READ BACK by the cluster-balanced
    * sampling gate: the clustering is the reusable persisted artifact,
    * sampling is the served query (an in-memory checkpoint would not survive
    * the bench harness's between-query cache clear). */
  private def clusteredFull(s: SparkSession, d: String): DataFrame = {
    val path = graft.core.TempLayouts.rootFor("graft_kmcluster_", d) { p =>
      Clustering.kmeans(Tables.embeddings(s, d), KmeansK, KmeansIters)
        .selectExpr("vec_id AS doc_id", "cluster", "dist", "cluster_size")
        .write.mode("overwrite").parquet(p)
    }
    s.read.parquet(path)
  }
  private def clusteredIds(s: SparkSession, d: String): DataFrame =
    clusteredFull(s, d).select("doc_id", "cluster")

  private def indexLake(s: SparkSession, d: String): graft.lake.ParquetDirFormat =
    new graft.lake.ParquetDirFormat(
      graft.core.TempLayouts.rootFor("graft_ann_index_", d) { root =>
        val lake = new graft.lake.ParquetDirFormat(root)
        Similarity.buildPqIndex(Tables.embeddings(s, d), lake)
        Similarity.buildIvfIndex(Tables.embeddings(s, d), lake)
        Similarity.buildLshIndex(Tables.embeddings(s, d), lake)
        Dedup.buildDedupIndex(corpusSplit(s, d), lake)
      })

  /** Corpus/batch split for the incremental-dedup gate: every 10th document
    * is "today's batch", the rest the accumulated corpus the index is built
    * over. Modulo (not range) split so batch docs interleave with their
    * near-dup cluster neighbors in the corpus. */
  private def corpusSplit(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).filter(org.apache.spark.sql.functions.col("doc_id") % 10 =!= 0)
  private def batchSplit(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0)

  /** Deterministic train/eval slices for the contamination-serve gate —
    * the SAME split-bucket arithmetic [[Dedup.minhashContamination]]
    * derives inline, so serve-vs-scan equality is meaningful. */
  private def trainSlice(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).filter(
      org.apache.spark.sql.functions.expr(Portable.splitBucketSpark("doc_id")) < 90)
  private def evalSlice(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).filter(
      org.apache.spark.sql.functions.expr(Portable.splitBucketSpark("doc_id")) >= 90)

  /** Per-source-dir PERSISTED eval-set contamination index (frozen eval
    * artifact, built once, served against every batch). */
  private def contamLake(s: SparkSession, d: String): graft.lake.ParquetDirFormat =
    new graft.lake.ParquetDirFormat(
      graft.core.TempLayouts.rootFor("graft_contam_index_", d) { root =>
        Dedup.buildContamIndex(evalSlice(s, d), new graft.lake.ParquetDirFormat(root))
      })

  // ---- oracle SQL ----------------------------------------------------------

  /** The e2e chain's input corpus: every doc re-lined into the constructed
    * 4-line boilerplate shape (same as `text_line_dedup`), plus TWO
    * marker-interleaved companions per 20th doc — every 8th token replaced
    * by a (doc, copy, position)-unique marker, so companions share NO
    * 8-token window with anything (they pass excision untouched, and the
    * corpus cannot excise them) while the c1/c2 pair keeps trigram Jaccard
    * ~0.45-0.51: the ONLY similarity shape that can reach the chain's
    * family stage, which is exactly what it exists to attribute. */
  private def e2eInput(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    graft.plans.GraftFunctions.register(s)
    val base = Tables.documents(s, d).withColumn("text", concat_ws("\n",
      expr("substr(text, 1, 40)"),
      expr("'standard disclaimer for ' || source"),
      expr("substr(text, 41)"),
      lit("copyright corpus collection")))
    def companion(c: Int) = Tables.documents(s, d)
      .filter(col("doc_id") % 20 === 0)
      .withColumn("text", expr(
        s"array_join(transform(graft_tokens(text), (t, i) -> " +
          s"IF((i + 1) % 8 = 0, " +
          s"concat('u', cast(doc_id as string), 'c$c', 'p', cast(i + 1 as string)), " +
          s"t)), ' ')"))
      .withColumn("doc_id", col("doc_id") + lit(c * 10000000L))
    base.unionByName(companion(1)).unionByName(companion(2))
  }

  /** Best-fit packing gates' input: every 13th doc padded 100 tokens past
    * the budget so the oversize arm fires at every sf. */
  private def bfInput(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).withColumn("text",
      org.apache.spark.sql.functions.expr(
        "CASE WHEN doc_id % 13 = 0 THEN concat(text, repeat(' padtok', 100)) " +
          "ELSE text END"))

  private val toks = Portable.tokensDuck("text")

  /** Exact replica of [[graft.operators.TextOps.bpeSegmentMerges]] given the
    * same frozen [[BpeMerges]] list: identical char wrap + rank-ordered
    * replace chain (plain string replace = greedy left-to-right
    * non-overlapping scan in BOTH engines — neither rescans replaced
    * output, and sentinel-wrapped symbols cannot span a replacement
    * boundary), vocab-sized distinct-word fold, join back, per-doc stats. */
  private val bpeSegmentSql = {
    val S = "\u001E"; val E = "\u001F"
    val wrapped = s"regexp_replace(word, '(.)', '$S\\1$E', 'g')"
    val enc = BpeMerges.foldLeft(wrapped) { case (e, (a, b)) =>
      s"replace($e, '$S$a$E$S$b$E', '$S$a$b$E')"
    }
    s"""WITH docs AS (SELECT doc_id, $toks AS toks FROM documents),
       |tok AS (SELECT doc_id, unnest(toks) AS word FROM docs),
       |w AS (SELECT DISTINCT word FROM tok),
       |g AS (SELECT word, CAST(length(e) - length(replace(e, '$S', '')) AS BIGINT) AS n_sub
       |  FROM (SELECT word, $enc AS e FROM w))
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  CAST(SUM(n_sub) AS BIGINT) AS n_subwords,
       |  CAST(MAX(n_sub) AS BIGINT) AS max_subwords_per_token,
       |  CAST(SUM(n_sub) AS BIGINT)::DOUBLE / COUNT(*) AS subwords_per_token
       |FROM tok JOIN g USING (word) GROUP BY doc_id""".stripMargin
  }

  private val tokenStatsSql =
    s"""WITH t AS (SELECT doc_id, text, $toks AS toks FROM documents),
       |s AS (SELECT doc_id, text, toks,
       |  list_reduce(list_prepend(0::BIGINT, list_transform(toks, x -> length(x)::BIGINT)), (a, x) -> a + x) AS n_token_chars,
       |  list_reduce(list_prepend(0::BIGINT, list_transform(toks, x -> CAST(ceil(length(x) / 4.0) AS BIGINT))), (a, x) -> a + x) AS n_subword_est
       |FROM t)
       |SELECT doc_id, len(toks) AS n_tokens, len(list_distinct(toks)) AS n_distinct_tokens,
       |  n_token_chars, n_subword_est, length(text) AS n_chars_text,
       |  ${Portable.phashDuck("text")} AS fingerprint,
       |  CASE WHEN len(toks) > 0 THEN n_token_chars::DOUBLE / len(toks) ELSE 0::DOUBLE END AS avg_token_len
       |FROM s""".stripMargin

  /** Exact replica of [[graft.operators.TextOps.unigramSurprisal]]: integer
    * bit-width surprisal (printf binary length here, conv-base-2 length on
    * the Spark side — identical for positive BIGINTs), integer sums, one
    * double division. */
  private val unigramSurprisalSql =
    s"""WITH docs AS (SELECT doc_id, $toks AS toks FROM documents),
       |tok AS (SELECT doc_id, unnest(toks) AS t FROM docs),
       |tf AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY t),
       |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM tf),
       |sc AS (SELECT doc_id, CAST(length(printf('%b', total // cnt)) - 1 AS BIGINT) AS bits
       |  FROM tok JOIN tf USING (t) CROSS JOIN tot)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  CAST(SUM(bits) AS BIGINT) AS sum_surprisal_bits,
       |  CAST(MAX(bits) AS BIGINT) AS max_surprisal_bits,
       |  CAST(SUM(bits) AS BIGINT)::DOUBLE / COUNT(*) AS mean_surprisal_bits
       |FROM sc GROUP BY doc_id""".stripMargin

  /** Exact replica of [[graft.operators.Dedup.cdcSharedChunks]]: the same
    * content-defined boundary rule (portable hash of the token mod 8 = 0
    * opens a chunk), per-doc prefix-sum chunk ids, ordered text reassembly,
    * and a group-by-TEXT rollup. Parallel unnests zip pos with token. */
  private val cdcChunksSql =
    s"""WITH d AS (SELECT doc_id, $toks AS toks FROM documents),
       |t AS (SELECT doc_id, unnest(range(1, len(toks) + 1)) AS pos, unnest(toks) AS t FROM d),
       |m AS (SELECT doc_id, pos, t,
       |  CASE WHEN ${Portable.phashDuck("t")} % 8 = 0 THEN 1 ELSE 0 END AS marker FROM t),
       |c AS (SELECT doc_id, pos, t, SUM(marker) OVER (PARTITION BY doc_id ORDER BY pos
       |  ROWS UNBOUNDED PRECEDING) AS chunk FROM m),
       |g AS (SELECT doc_id, chunk, string_agg(t, ' ' ORDER BY pos) AS chunk_text
       |  FROM c GROUP BY doc_id, chunk)
       |SELECT chunk_text, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |  CAST(COUNT(*) AS BIGINT) AS n_occurrences, MIN(doc_id) AS first_doc_id
       |FROM g GROUP BY chunk_text HAVING COUNT(DISTINCT doc_id) >= 2""".stripMargin

  /** Exact replica of [[graft.operators.TextOps.bigramSurprisal]]: corpus
    * bigram LM (context counts = bigram counts re-grouped by first token),
    * integer bit-width conditional surprisal floor(log2(ctx // cnt)), integer
    * sums, one double division. Docs with < 2 tokens have no bigrams and no
    * row, in both engines by shingle construction. */
  private val bigramSurprisalSql =
    s"""WITH docs AS (SELECT doc_id, $toks AS toks FROM documents),
       |bgr AS (SELECT doc_id, unnest(${Portable.shinglesDuck("toks", 2)}) AS bg FROM docs),
       |bf AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS cnt FROM bgr GROUP BY bg),
       |ctx AS (SELECT string_split(bg, ' ')[1] AS w1, CAST(SUM(cnt) AS BIGINT) AS ctx_cnt
       |  FROM bf GROUP BY 1),
       |sc AS (SELECT doc_id, CAST(length(printf('%b', ctx_cnt // cnt)) - 1 AS BIGINT) AS bits
       |  FROM bgr JOIN bf USING (bg) JOIN ctx ON string_split(bgr.bg, ' ')[1] = ctx.w1)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       |  CAST(SUM(bits) AS BIGINT) AS sum_surprisal_bits,
       |  CAST(MAX(bits) AS BIGINT) AS max_surprisal_bits,
       |  CAST(SUM(bits) AS BIGINT)::DOUBLE / COUNT(*) AS mean_surprisal_bits
       |FROM sc GROUP BY doc_id""".stripMargin

  /** Exact replica of [[graft.operators.TextOps.trigramSurprisal]]: trigram
    * LM with leading-bigram context counts, integer bit-width surprisal,
    * integer sums, one double division. */
  private val trigramSurprisalSql =
    s"""WITH docs AS (SELECT doc_id, $toks AS toks FROM documents),
       |tgr AS (SELECT doc_id, unnest(${Portable.shinglesDuck("toks", 3)}) AS tg FROM docs),
       |tf AS (SELECT tg, CAST(COUNT(*) AS BIGINT) AS cnt FROM tgr GROUP BY tg),
       |ctx AS (SELECT array_to_string(string_split(tg, ' ')[1:2], ' ') AS c2,
       |  CAST(SUM(cnt) AS BIGINT) AS ctx_cnt FROM tf GROUP BY 1),
       |sc AS (SELECT doc_id, CAST(length(printf('%b', ctx_cnt // cnt)) - 1 AS BIGINT) AS bits
       |  FROM tgr JOIN tf USING (tg)
       |  JOIN ctx ON array_to_string(string_split(tgr.tg, ' ')[1:2], ' ') = ctx.c2)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
       |  CAST(SUM(bits) AS BIGINT) AS sum_surprisal_bits,
       |  CAST(MAX(bits) AS BIGINT) AS max_surprisal_bits,
       |  CAST(SUM(bits) AS BIGINT)::DOUBLE / COUNT(*) AS mean_surprisal_bits
       |FROM sc GROUP BY doc_id""".stripMargin

  /** Exact replica of [[graft.operators.TextOps.chunkWindows]]: ceil-covering
    * chunk count, range-unnest per chunk, inclusive 1-based list slice joined
    * by single spaces — all integer arithmetic. */
  private val chunkWindowsSql = {
    val (cs, st) = (ChunkSize, ChunkStride)
    s"""WITH d AS (SELECT doc_id, $toks AS toks FROM documents),
       |nn AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n FROM d WHERE len(toks) > 0),
       |c AS (SELECT doc_id, toks, n,
       |  CASE WHEN n <= $cs THEN 1 ELSE 1 + ((n - $cs + ${st - 1}) // $st) END AS n_chunks FROM nn),
       |x AS (SELECT doc_id, toks, n, unnest(range(0, n_chunks)) AS idx FROM c)
       |SELECT doc_id, CAST(idx AS BIGINT) AS chunk_idx,
       |  CAST(idx * $st + 1 AS BIGINT) AS tok_start,
       |  CAST(least($cs, n - idx * $st) AS BIGINT) AS n_chunk_toks,
       |  array_to_string(toks[(idx * $st + 1):(idx * $st + $cs)], ' ') AS chunk_text
       |FROM x""".stripMargin
  }

  /** Exact replica of [[graft.operators.TextOps.temperatureSample]]: the
    * oracle states the SEMANTICS in one per-domain window (row_number ordered
    * by bucket, salted key, id) — the Spark side computes the identical rank
    * two-phase. Quotas are exact-integer: isqrt weights, bigint multiply,
    * floor division. */
  private val temperatureSampleSql =
    s"""WITH t AS (SELECT doc_id, $TempDomExpr AS dom,
       |  ${Portable.sampleBucketDuck("doc_id")} AS bkt,
       |  ${Portable.tempKeyDuck("doc_id")} AS tk FROM documents),
       |cc AS (SELECT dom, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY dom),
       |w AS (SELECT dom, ${Portable.isqrtDuck("c")} AS w FROM cc),
       |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM w),
       |q AS (SELECT dom, CAST(($TempTargetDocs * w) // tw AS BIGINT) AS quota
       |  FROM w CROSS JOIN tot),
       |r AS (SELECT doc_id, dom,
       |  CAST(row_number() OVER (PARTITION BY dom ORDER BY bkt, tk, doc_id) AS BIGINT) AS dom_rank
       |  FROM t)
       |SELECT r.doc_id, r.dom, r.dom_rank, q.quota
       |FROM r JOIN q USING (dom) WHERE r.dom_rank <= q.quota""".stripMargin

  /** Exact replica of [[graft.operators.TextOps.dsirScores]]: hashed
    * unigram+bigram bucket counts, integer floor-log2 log-likelihood ratios
    * (difference form, add-1/add-B smoothing — never a count product), exact
    * 75th-percentile selection threshold. */
  private val dsirSql = {
    val targets = DsirTargetSources.map(s => s"'$s'").mkString(", ")
    val B = DsirBuckets
    s"""WITH t AS (SELECT doc_id, source IN ($targets) AS is_target, $toks AS toks FROM documents),
       |f AS (SELECT doc_id, is_target,
       |  unnest(list_concat(toks, ${Portable.shinglesDuck("toks", 2)})) AS f FROM t),
       |fb AS (SELECT doc_id, is_target, ${Portable.phashDuck("f")} % $B AS b FROM f),
       |db AS (SELECT doc_id, is_target, b, CAST(COUNT(*) AS BIGINT) AS c FROM fb GROUP BY 1, 2, 3),
       |p AS (SELECT b, CAST(SUM(c) AS BIGINT) AS p_cnt FROM db WHERE is_target GROUP BY b),
       |q AS (SELECT b, CAST(SUM(c) AS BIGINT) AS q_cnt FROM db WHERE NOT is_target GROUP BY b),
       |l AS (SELECT COALESCE(p.b, q.b) AS b, COALESCE(p_cnt, 0) AS p_cnt, COALESCE(q_cnt, 0) AS q_cnt
       |  FROM p FULL OUTER JOIN q ON p.b = q.b),
       |tot AS (SELECT CAST(SUM(p_cnt) AS BIGINT) AS p_tot, CAST(SUM(q_cnt) AS BIGINT) AS q_tot FROM l),
       |lr AS (SELECT b,
       |  (length(printf('%b', p_cnt + 1)) - 1) - (length(printf('%b', p_tot + $B)) - 1)
       |  - (length(printf('%b', q_cnt + 1)) - 1) + (length(printf('%b', q_tot + $B)) - 1) AS llr
       |  FROM l, tot),
       |sc AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_feats,
       |  CAST(SUM(c * llr) AS BIGINT) AS dsir_score
       |  FROM db JOIN lr USING (b) GROUP BY doc_id),
       |thr AS (SELECT quantile_cont(dsir_score, $DsirKeepPct) AS thr FROM sc)
       |SELECT doc_id, n_feats, dsir_score, dsir_score::DOUBLE >= thr AS selected
       |FROM sc, thr""".stripMargin
  }

  /** Exact replica of [[graft.operators.Dedup.exactSubstrExcise]]: same
    * ordered window shingles, md5 window identity, island-merge span logic
    * (same COALESCE(-1) break test), and per-token NOT EXISTS excision. */
  private val substrExciseSql = {
    val shingles = Portable.shinglesDuck("toks", SubstrWindow)
    val L = SubstrWindow
    s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
       |w0 AS (SELECT doc_id, generate_subscripts($shingles, 1) - 1 AS pos,
       |  unnest($shingles) AS win FROM t),
       |wh AS (SELECT doc_id, pos, md5(win) AS whash FROM w0),
       |rep AS (SELECT whash FROM wh GROUP BY whash HAVING COUNT(*) > 1),
       |r AS (SELECT wh.doc_id, wh.pos FROM wh JOIN rep USING (whash)),
       |i1 AS (SELECT doc_id, pos,
       |  CASE WHEN pos > COALESCE(MAX(pos + $L) OVER (PARTITION BY doc_id ORDER BY pos
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) THEN 1 ELSE 0 END AS brk
       |  FROM r),
       |i2 AS (SELECT doc_id, pos, SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS gid FROM i1),
       |sp AS (SELECT doc_id, MIN(pos) AS s, MAX(pos) + $L AS e FROM i2 GROUP BY doc_id, gid),
       |tp AS (SELECT doc_id, generate_subscripts(toks, 1) - 1 AS i, unnest(toks) AS tok FROM t),
       |kept AS (SELECT tp.doc_id, tp.i, tp.tok FROM tp WHERE NOT EXISTS
       |  (SELECT 1 FROM sp WHERE sp.doc_id = tp.doc_id AND tp.i >= sp.s AND tp.i < sp.e)),
       |fin AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
       |  string_agg(tok, ' ' ORDER BY i) AS clean_text FROM kept GROUP BY doc_id)
       |SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       |  CAST(len(toks) - COALESCE(fin.n_kept, 0) AS BIGINT) AS n_removed,
       |  COALESCE(fin.clean_text, '') AS clean_text
       |FROM t LEFT JOIN fin USING (doc_id)""".stripMargin
  }

  /** Mirror of [[TextOps.curationDecisions]] (targets = en, minQuality 2.0):
    * the same signal chains as the language-ID, quality, repetition, and
    * exact-dedup oracles, folded by the same first-failing-filter CASE.
    * lazy: composes [[langCase]], declared further down. */
  private lazy val curationSql =
    s"""WITH t AS (SELECT doc_id, text, $toks AS toks FROM documents),
       |k AS (SELECT md5(text) AS k, MIN(doc_id) AS keep FROM documents GROUP BY 1),
       |ex AS (SELECT d.doc_id, d.doc_id <> k.keep AS is_exact_dup
       |  FROM documents d JOIN k ON md5(d.text) = k.k),
       |lg AS (SELECT doc_id,
       |  ${Portable.stopRatioDuck("toks", Portable.StopEn)} AS r_en,
       |  ${Portable.stopRatioDuck("toks", Portable.StopEs)} AS r_es,
       |  ${Portable.stopRatioDuck("toks", Portable.StopDe)} AS r_de,
       |  ${Portable.stopRatioDuck("toks", Portable.StopFr)} AS r_fr
       |FROM t),
       |lp AS (SELECT doc_id, $langCase AS lang_pred FROM lg),
       |c AS (SELECT doc_id, text, toks,
       |  len(toks) AS n_tokens, len(list_distinct(toks)) AS n_distinct,
       |  ${Portable.stopRatioDuck("toks", Portable.StopEn)} AS stop_ratio,
       |  length(regexp_replace(text, '[^a-z ]', '', 'g')) AS alpha_chars
       |FROM t),
       |q AS (SELECT doc_id,
       |  (CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END) +
       |  (CASE WHEN stop_ratio > 0 THEN 1.0 ELSE 0.0 END) +
       |  CASE WHEN n_tokens > 0 THEN n_distinct::DOUBLE / n_tokens ELSE 0::DOUBLE END +
       |  CASE WHEN length(text) > 0 THEN alpha_chars::DOUBLE / length(text) ELSE 0::DOUBLE END AS quality_score
       |FROM c),
       |tk AS (SELECT doc_id, toks FROM t WHERE len(toks) > 0),
       |uc AS (SELECT doc_id, t, COUNT(*) AS tf
       |  FROM (SELECT doc_id, unnest(toks) AS t FROM tk) GROUP BY doc_id, t),
       |ua AS (SELECT doc_id, SUM(tf) AS n, MAX(tf) AS top FROM uc GROUP BY doc_id),
       |bc AS (SELECT doc_id, t, COUNT(*) AS tf
       |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
       |    i -> toks[i] || ' ' || toks[i + 1])) AS t FROM tk WHERE len(toks) > 1)
       |  GROUP BY doc_id, t),
       |ba AS (SELECT doc_id, SUM(tf) AS n, MAX(tf) AS top FROM bc GROUP BY doc_id),
       |rep AS (SELECT ua.doc_id,
       |  (ua.top::DOUBLE / ua.n > 0.2 OR COALESCE(ba.top::DOUBLE / ba.n, 0.0) > 0.18) AS is_rep
       |  FROM ua LEFT JOIN ba ON ua.doc_id = ba.doc_id),
       |r AS (SELECT ex.doc_id,
       |  CASE WHEN ex.is_exact_dup THEN 'exact_dup'
       |       WHEN lp.lang_pred NOT IN ('en') THEN 'lang'
       |       WHEN q.quality_score < 2.0 THEN 'quality'
       |       WHEN COALESCE(rep.is_rep, FALSE) THEN 'repetition'
       |       ELSE 'keep' END AS reason
       |FROM ex JOIN lp ON ex.doc_id = lp.doc_id JOIN q ON ex.doc_id = q.doc_id
       |LEFT JOIN rep ON ex.doc_id = rep.doc_id)
       |SELECT doc_id, reason = 'keep' AS keep, reason FROM r""".stripMargin

  /** Mirror of [[TextOps.curationDecisionsFamilies]]: the union family graph
    * (exact md5 star edges + exact all-pairs near-dup edges, equal to the
    * banded MinHash output under the 2e-8 miss contract) closed by a
    * recursive CTE, keepers ranked by (quality_score DESC, doc_id ASC), and
    * non-keepers attributed exact_dup (byte-identical twin exists) vs
    * near_dup before the lang > quality > repetition chain. Shares the
    * signal CTE text with [[curationSql]] and the closure with
    * [[survivorsQualitySql]]. */
  /** The family-decision CTE chain through `r` (doc_id, reason), shared by
    * the `text_curation_families` oracle and the shard-provenance oracle.
    * With `decontamPct` < 100 the in-chain decontamination leg joins in:
    * cross-split verified near-dup pairs drop their TRAIN side as
    * 'contaminated', priority exact_dup > contaminated > near_dup — the
    * same fragment the e2e oracle runs, re-rooted on the raw corpus. */
  private def familiesReasonCtes(decontamPct: Int): String = {
    val contCtes =
      if (decontamPct >= 100) ""
      else
        s"""spl AS (SELECT doc_id,
           |  ${Portable.splitBucketDuck("doc_id")} < $decontamPct AS is_train FROM documents),
           |cont AS MATERIALIZED (SELECT DISTINCT
           |    CASE WHEN sa.is_train THEN p.doc_a ELSE p.doc_b END AS doc_id
           |  FROM pairs p JOIN spl sa ON p.doc_a = sa.doc_id
           |  JOIN spl sb ON p.doc_b = sb.doc_id
           |  WHERE sa.is_train <> sb.is_train),
           |""".stripMargin
    val contBranch =
      if (decontamPct >= 100) ""
      else "\n       WHEN cont.doc_id IS NOT NULL THEN 'contaminated'"
    val contJoin =
      if (decontamPct >= 100) ""
      else "\nLEFT JOIN cont ON fam.doc_id = cont.doc_id"
    // with the decontamination leg, `pairs` gains a second reference (cont
    // + alledges) — materialize it so DuckDB's default CTE inlining does
    // not re-run the whole jaccard chain per reference (the CLAUDE.md
    // multi-referenced-CTE rule)
    // ... and `r` gains a second reference in the provenance oracle (keptids
    // + lab), so the whole decision chain above it would re-run twice
    val pairsKw = if (decontamPct >= 100) "" else " MATERIALIZED"
    val rKw = if (decontamPct >= 100) "" else " MATERIALIZED"
    s"""$jaccardCtes,
       |pairs AS$pairsKw ($jaccardSelect),
       |${contCtes}k AS (SELECT md5(text) AS k, MIN(doc_id) AS g, COUNT(*) AS kc
       |  FROM documents GROUP BY 1),
       |ek AS MATERIALIZED (SELECT d.doc_id, k.g, k.kc FROM documents d
       |  JOIN k ON md5(d.text) = k.k),
       |xe AS (SELECT doc_id AS doc_a, g AS doc_b FROM ek WHERE doc_id <> g),
       |alledges AS (SELECT doc_a, doc_b FROM pairs
       |  UNION SELECT doc_a, doc_b FROM xe),
       |edges AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM alledges
       |  UNION SELECT doc_b, doc_a FROM alledges),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       |comp AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS component_id
       |  FROM reach GROUP BY a),
       |t AS MATERIALIZED (SELECT doc_id, text, $toks AS toks FROM documents),
       |lg AS (SELECT doc_id,
       |  ${Portable.stopRatioDuck("toks", Portable.StopEn)} AS r_en,
       |  ${Portable.stopRatioDuck("toks", Portable.StopEs)} AS r_es,
       |  ${Portable.stopRatioDuck("toks", Portable.StopDe)} AS r_de,
       |  ${Portable.stopRatioDuck("toks", Portable.StopFr)} AS r_fr
       |FROM t),
       |lp AS (SELECT doc_id, $langCase AS lang_pred FROM lg),
       |c AS (SELECT doc_id, text, toks,
       |  len(toks) AS n_tokens, len(list_distinct(toks)) AS n_distinct,
       |  ${Portable.stopRatioDuck("toks", Portable.StopEn)} AS stop_ratio,
       |  length(regexp_replace(text, '[^a-z ]', '', 'g')) AS alpha_chars
       |FROM t),
       |q AS MATERIALIZED (SELECT doc_id,
       |  (CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END) +
       |  (CASE WHEN stop_ratio > 0 THEN 1.0 ELSE 0.0 END) +
       |  CASE WHEN n_tokens > 0 THEN n_distinct::DOUBLE / n_tokens ELSE 0::DOUBLE END +
       |  CASE WHEN length(text) > 0 THEN alpha_chars::DOUBLE / length(text) ELSE 0::DOUBLE END AS quality_score
       |FROM c),
       |fam AS MATERIALIZED (SELECT ek.doc_id, ek.kc,
       |  COALESCE(cm.component_id, ek.doc_id) AS family
       |  FROM ek LEFT JOIN comp cm ON cm.doc_id = ek.doc_id),
       |fr AS (SELECT fam.family, fam.doc_id, ROW_NUMBER() OVER (
       |  PARTITION BY fam.family ORDER BY q.quality_score DESC, fam.doc_id ASC) AS rn
       |  FROM fam JOIN q ON q.doc_id = fam.doc_id),
       |kp AS (SELECT family, doc_id AS keep_doc_id FROM fr WHERE rn = 1),
       |tk AS (SELECT doc_id, toks FROM t WHERE len(toks) > 0),
       |uc AS (SELECT doc_id, t, COUNT(*) AS tf
       |  FROM (SELECT doc_id, unnest(toks) AS t FROM tk) GROUP BY doc_id, t),
       |ua AS (SELECT doc_id, SUM(tf) AS n, MAX(tf) AS top FROM uc GROUP BY doc_id),
       |bc AS (SELECT doc_id, t, COUNT(*) AS tf
       |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
       |    i -> toks[i] || ' ' || toks[i + 1])) AS t FROM tk WHERE len(toks) > 1)
       |  GROUP BY doc_id, t),
       |ba AS (SELECT doc_id, SUM(tf) AS n, MAX(tf) AS top FROM bc GROUP BY doc_id),
       |rep AS (SELECT ua.doc_id,
       |  (ua.top::DOUBLE / ua.n > 0.2 OR COALESCE(ba.top::DOUBLE / ba.n, 0.0) > 0.18) AS is_rep
       |  FROM ua LEFT JOIN ba ON ua.doc_id = ba.doc_id),
       |r AS$rKw (SELECT fam.doc_id,
       |  CASE WHEN fam.doc_id <> kp.keep_doc_id AND fam.kc > 1 THEN 'exact_dup'$contBranch
       |       WHEN fam.doc_id <> kp.keep_doc_id THEN 'near_dup'
       |       WHEN lp.lang_pred NOT IN ('en') THEN 'lang'
       |       WHEN q.quality_score < 2.0 THEN 'quality'
       |       WHEN COALESCE(rep.is_rep, FALSE) THEN 'repetition'
       |       ELSE 'keep' END AS reason
       |FROM fam JOIN kp USING (family)
       |JOIN lp ON fam.doc_id = lp.doc_id JOIN q ON fam.doc_id = q.doc_id
       |LEFT JOIN rep ON fam.doc_id = rep.doc_id$contJoin)""".stripMargin
  }

  private lazy val curationFamiliesSql =
    s"""WITH RECURSIVE ${familiesReasonCtes(100)}
       |SELECT doc_id, reason = 'keep' AS keep, reason FROM r""".stripMargin

  /** Mirror of [[TextOps.shardProvenance]] over the decontaminating family
    * decision: the shared `r` chain (decontamPct 90), kept docs assigned
    * their shuffle shard, dropped docs pooled under shard -1 with their
    * first-failing stage, two report-sized aggregates. */
  private lazy val shardProvenanceSql =
    s"""WITH RECURSIVE ${familiesReasonCtes(90)},
       |mtk AS (SELECT d.doc_id, d.source, d.lang, len(t.toks) AS n_toks
       |  FROM documents d JOIN t ON d.doc_id = t.doc_id),
       |keptids AS (SELECT doc_id FROM r WHERE reason = 'keep'),
       |sh AS (SELECT doc_id,
       |  CAST(${Portable.shuffleKeyDuck("doc_id")} % 16 AS INT) AS shard FROM keptids),
       |lab AS (SELECT COALESCE(sh.shard, -1) AS shard, m.source, m.lang,
       |  CASE WHEN r.reason = 'keep' THEN 'kept' ELSE r.reason END AS stage,
       |  m.n_toks
       |  FROM r JOIN mtk m ON r.doc_id = m.doc_id
       |  LEFT JOIN sh ON r.doc_id = sh.doc_id),
       |g AS MATERIALIZED (SELECT shard, source, lang, stage,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens
       |  FROM lab GROUP BY 1, 2, 3, 4),
       |tot AS (SELECT shard, CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
       |  FROM g GROUP BY shard)
       |SELECT g.shard, g.source, g.lang, g.stage, g.n_docs, g.n_tokens,
       |  CASE WHEN tot.shard_tokens = 0 THEN CAST(0 AS DOUBLE)
       |       ELSE CAST(g.n_tokens AS DOUBLE) / tot.shard_tokens END AS shard_token_share
       |FROM g JOIN tot ON g.shard = tot.shard""".stripMargin

  /** Oracle twin of [[TextOps.curationPipeline]] over the constructed 4-line
    * text: SEVEN stages CTE-composed in one statement, each stage's fragment
    * the same SQL its standalone oracle uses, re-rooted on the previous
    * stage's output — so a column-contract drift between stages breaks the
    * hash even when every standalone gate stays green. Stage 4 is the
    * FAMILY-level decision ([[curationFamiliesSql]]'s machinery re-rooted on
    * d3: recursive-CTE closure of exact stars + all-pairs near-dup edges,
    * quality keepers, exact_dup/near_dup attribution) plus the in-chain
    * DECONTAMINATION leg (njac cross-split pairs at the same tau → the
    * train side drops as 'contaminated', priority right after exact_dup).
    * Every output column is
    * BIGINT/INT/VARCHAR (no floats cross the comparator). lazy: composes
    * [[langCase]], declared further down.
    *
    * The chain-root CTEs are declared MATERIALIZED: DuckDB inlines CTEs by
    * default, and with d3 referenced four ways (each re-deriving d2, d1, d0
    * in turn) the inlined plan re-evaluates the whole upstream chain
    * multiplicatively — measured 600+ s and 36 GB of spill at sf0.1 where
    * the materialized form runs in ~2 s bit-identically. */
  private lazy val curationE2ESql = {
    val targets = DsirTargetSources.map(s => s"'$s'").mkString(", ")
    val B = DsirBuckets
    val L = SubstrWindow
    val sh8 = Portable.shinglesDuck("toks", L)
    s"""WITH RECURSIVE d0 AS MATERIALIZED (
       |SELECT doc_id, source, lang,
       |  substr(text, 1, 40) || chr(10) || 'standard disclaimer for ' || source
       |    || chr(10) || substr(text, 41) || chr(10) || 'copyright corpus collection' AS text
       |FROM documents
       |UNION ALL
       |SELECT doc_id + cc * 10000000, source, lang,
       |  array_to_string(list_transform(generate_series(1, len(tk)),
       |    i -> CASE WHEN i % 8 = 0
       |         THEN 'u' || doc_id || 'c' || cc || 'p' || i ELSE tk[i] END), ' ')
       |FROM (SELECT doc_id, source, lang, $toks AS tk
       |      FROM documents WHERE doc_id % 20 = 0),
       |     (SELECT unnest([1, 2]) AS cc)),
       |ll AS (SELECT doc_id,
       |  generate_subscripts(string_split(text, chr(10)), 1) - 1 AS pos,
       |  unnest(string_split(text, chr(10))) AS line FROM d0),
       |lnz AS MATERIALIZED (SELECT * FROM ll WHERE line <> ''),
       |lf AS (SELECT line, COUNT(DISTINCT doc_id) AS line_df FROM lnz GROUP BY line),
       |lk AS (SELECT lnz.doc_id, lnz.pos, lnz.line FROM lnz JOIN lf USING (line)
       |  WHERE lf.line_df <= $LineMaxDf),
       |lka AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text
       |  FROM lk GROUP BY doc_id),
       |d1 AS MATERIALIZED (SELECT d0.doc_id, d0.source, d0.lang, COALESCE(lka.clean_text, '') AS text
       |  FROM d0 LEFT JOIN lka USING (doc_id)),
       |t2 AS MATERIALIZED (SELECT doc_id, $toks AS toks FROM d1),
       |w0 AS (SELECT doc_id, generate_subscripts($sh8, 1) - 1 AS pos,
       |  unnest($sh8) AS win FROM t2),
       |wh AS MATERIALIZED (SELECT doc_id, pos, md5(win) AS whash FROM w0),
       |wrep AS (SELECT whash FROM wh GROUP BY whash HAVING COUNT(*) > 1),
       |wr AS (SELECT wh.doc_id, wh.pos FROM wh JOIN wrep USING (whash)),
       |wi1 AS (SELECT doc_id, pos,
       |  CASE WHEN pos > COALESCE(MAX(pos + $L) OVER (PARTITION BY doc_id ORDER BY pos
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) THEN 1 ELSE 0 END AS brk
       |  FROM wr),
       |wi2 AS (SELECT doc_id, pos, SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS gid FROM wi1),
       |wsp AS (SELECT doc_id, MIN(pos) AS s, MAX(pos) + $L AS e FROM wi2 GROUP BY doc_id, gid),
       |wtp AS (SELECT doc_id, generate_subscripts(toks, 1) - 1 AS i, unnest(toks) AS tok FROM t2),
       |wkept AS (SELECT wtp.doc_id, wtp.i, wtp.tok FROM wtp WHERE NOT EXISTS
       |  (SELECT 1 FROM wsp WHERE wsp.doc_id = wtp.doc_id AND wtp.i >= wsp.s AND wtp.i < wsp.e)),
       |wfin AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS clean_text FROM wkept GROUP BY doc_id),
       |d2 AS MATERIALIZED (SELECT d1.doc_id, d1.source, d1.lang, COALESCE(wfin.clean_text, '') AS text
       |  FROM d1 LEFT JOIN wfin USING (doc_id)),
       |st AS (SELECT doc_id, source IN ($targets) AS is_target, $toks AS toks FROM d2),
       |sf AS (SELECT doc_id, is_target,
       |  unnest(list_concat(toks, ${Portable.shinglesDuck("toks", 2)})) AS f FROM st),
       |sfb AS (SELECT doc_id, is_target, ${Portable.phashDuck("f")} % $B AS b FROM sf),
       |sdb AS MATERIALIZED (SELECT doc_id, is_target, b, CAST(COUNT(*) AS BIGINT) AS c FROM sfb GROUP BY 1, 2, 3),
       |sp AS (SELECT b, CAST(SUM(c) AS BIGINT) AS p_cnt FROM sdb WHERE is_target GROUP BY b),
       |sq AS (SELECT b, CAST(SUM(c) AS BIGINT) AS q_cnt FROM sdb WHERE NOT is_target GROUP BY b),
       |sl AS (SELECT COALESCE(sp.b, sq.b) AS b, COALESCE(p_cnt, 0) AS p_cnt, COALESCE(q_cnt, 0) AS q_cnt
       |  FROM sp FULL OUTER JOIN sq ON sp.b = sq.b),
       |stot AS (SELECT CAST(SUM(p_cnt) AS BIGINT) AS p_tot, CAST(SUM(q_cnt) AS BIGINT) AS q_tot FROM sl),
       |slr AS (SELECT b,
       |  (length(printf('%b', p_cnt + 1)) - 1) - (length(printf('%b', p_tot + $B)) - 1)
       |  - (length(printf('%b', q_cnt + 1)) - 1) + (length(printf('%b', q_tot + $B)) - 1) AS llr
       |  FROM sl CROSS JOIN stot),
       |ssc AS (SELECT doc_id, CAST(SUM(c * llr) AS BIGINT) AS dsir_score
       |  FROM sdb JOIN slr USING (b) GROUP BY doc_id),
       |sthr AS (SELECT quantile_cont(dsir_score, $DsirKeepPct) AS thr FROM ssc),
       |d3 AS MATERIALIZED (SELECT d2.* FROM d2 JOIN ssc USING (doc_id) CROSS JOIN sthr
       |  WHERE ssc.dsir_score::DOUBLE >= sthr.thr),
       |ct AS MATERIALIZED (SELECT doc_id, text, $toks AS toks FROM d3),
       |ctk AS MATERIALIZED (SELECT doc_id, toks FROM ct WHERE len(toks) > 0),
       |nk AS (SELECT md5(text) AS k, MIN(doc_id) AS g, COUNT(*) AS kc
       |  FROM d3 GROUP BY 1),
       |nke AS MATERIALIZED (SELECT d.doc_id, nk.g, nk.kc FROM d3 d
       |  JOIN nk ON md5(d.text) = nk.k),
       |nxe AS (SELECT doc_id AS doc_a, g AS doc_b FROM nke WHERE doc_id <> g),
       |nsets AS (SELECT doc_id, list_distinct(${Portable.shinglesDuck("toks", 3)}) AS sh FROM ctk),
       |nsets2 AS MATERIALIZED (SELECT doc_id, sh, len(sh) AS n FROM nsets WHERE len(sh) > 0),
       |nshr AS (SELECT doc_id, unnest(sh) AS s FROM nsets2),
       |npr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
       |  FROM nshr a JOIN nshr b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
       |njac AS MATERIALIZED (SELECT doc_a, doc_b,
       |    inter::DOUBLE / (x.n + y.n - inter) AS jaccard
       |  FROM npr JOIN nsets2 x ON doc_a = x.doc_id JOIN nsets2 y ON doc_b = y.doc_id),
       |npairs AS (SELECT doc_a, doc_b FROM njac WHERE jaccard >= $E2eNearTau),
       |nspl AS (SELECT doc_id,
       |  ${Portable.splitBucketDuck("doc_id")} < $E2eDecontamPct AS is_train FROM d3),
       |ncont AS MATERIALIZED (SELECT DISTINCT
       |    CASE WHEN sa.is_train THEN j.doc_a ELSE j.doc_b END AS doc_id
       |  FROM njac j JOIN nspl sa ON j.doc_a = sa.doc_id
       |  JOIN nspl sb ON j.doc_b = sb.doc_id
       |  WHERE j.jaccard >= $E2eNearTau AND sa.is_train <> sb.is_train),
       |nall AS (SELECT doc_a, doc_b FROM npairs UNION SELECT doc_a, doc_b FROM nxe),
       |nedges AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM nall
       |  UNION SELECT doc_b, doc_a FROM nall),
       |nreach(a, b) AS (
       |  SELECT a, b FROM nedges
       |  UNION
       |  SELECT r.a, e.b FROM nreach r JOIN nedges e ON r.b = e.a),
       |ncomp AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS component_id
       |  FROM nreach GROUP BY a),
       |clg AS (SELECT doc_id,
       |  ${Portable.stopRatioDuck("toks", Portable.StopEn)} AS r_en,
       |  ${Portable.stopRatioDuck("toks", Portable.StopEs)} AS r_es,
       |  ${Portable.stopRatioDuck("toks", Portable.StopDe)} AS r_de,
       |  ${Portable.stopRatioDuck("toks", Portable.StopFr)} AS r_fr
       |FROM ct),
       |clp AS (SELECT doc_id, $langCase AS lang_pred FROM clg),
       |cc AS (SELECT doc_id, text, toks,
       |  len(toks) AS n_tokens, len(list_distinct(toks)) AS n_distinct,
       |  ${Portable.stopRatioDuck("toks", Portable.StopEn)} AS stop_ratio,
       |  length(regexp_replace(text, '[^a-z ]', '', 'g')) AS alpha_chars
       |FROM ct),
       |cq AS (SELECT doc_id,
       |  (CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END) +
       |  (CASE WHEN stop_ratio > 0 THEN 1.0 ELSE 0.0 END) +
       |  CASE WHEN n_tokens > 0 THEN n_distinct::DOUBLE / n_tokens ELSE 0::DOUBLE END +
       |  CASE WHEN length(text) > 0 THEN alpha_chars::DOUBLE / length(text) ELSE 0::DOUBLE END AS quality_score
       |FROM cc),
       |nfam AS MATERIALIZED (SELECT nke.doc_id, nke.kc,
       |  COALESCE(nc.component_id, nke.doc_id) AS family
       |  FROM nke LEFT JOIN ncomp nc ON nc.doc_id = nke.doc_id),
       |nfr AS (SELECT nfam.family, nfam.doc_id, ROW_NUMBER() OVER (
       |  PARTITION BY nfam.family ORDER BY cq.quality_score DESC, nfam.doc_id ASC) AS rn
       |  FROM nfam JOIN cq ON cq.doc_id = nfam.doc_id),
       |nkp AS (SELECT family, doc_id AS keep_doc_id FROM nfr WHERE rn = 1),
       |cuc AS (SELECT doc_id, t, COUNT(*) AS tf
       |  FROM (SELECT doc_id, unnest(toks) AS t FROM ctk) GROUP BY doc_id, t),
       |cua AS (SELECT doc_id, SUM(tf) AS n, MAX(tf) AS top FROM cuc GROUP BY doc_id),
       |cbc AS (SELECT doc_id, t, COUNT(*) AS tf
       |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
       |    i -> toks[i] || ' ' || toks[i + 1])) AS t FROM ctk WHERE len(toks) > 1)
       |  GROUP BY doc_id, t),
       |cba AS (SELECT doc_id, SUM(tf) AS n, MAX(tf) AS top FROM cbc GROUP BY doc_id),
       |crep AS (SELECT cua.doc_id,
       |  (cua.top::DOUBLE / cua.n > 0.2 OR COALESCE(cba.top::DOUBLE / cba.n, 0.0) > 0.18) AS is_rep
       |  FROM cua LEFT JOIN cba ON cua.doc_id = cba.doc_id),
       |cr AS (SELECT nfam.doc_id,
       |  CASE WHEN nfam.doc_id <> nkp.keep_doc_id AND nfam.kc > 1 THEN 'exact_dup'
       |       WHEN nct.doc_id IS NOT NULL THEN 'contaminated'
       |       WHEN nfam.doc_id <> nkp.keep_doc_id THEN 'near_dup'
       |       WHEN clp.lang_pred NOT IN ('en') THEN 'lang'
       |       WHEN cq.quality_score < 2.0 THEN 'quality'
       |       WHEN COALESCE(crep.is_rep, FALSE) THEN 'repetition'
       |       ELSE 'keep' END AS reason
       |FROM nfam JOIN nkp USING (family)
       |JOIN clp ON nfam.doc_id = clp.doc_id JOIN cq ON nfam.doc_id = cq.doc_id
       |LEFT JOIN crep ON nfam.doc_id = crep.doc_id
       |LEFT JOIN ncont nct ON nfam.doc_id = nct.doc_id),
       |d4 AS MATERIALIZED (SELECT d3.* FROM d3 JOIN cr USING (doc_id) WHERE cr.reason = 'keep'),
       |bt AS (SELECT doc_id, source, CAST(len($toks) AS BIGINT) AS n_tokens,
       |  ${Portable.sampleBucketDuck("doc_id")} AS bkt FROM d4),
       |bcum AS (SELECT doc_id, source, n_tokens,
       |  SUM(n_tokens) OVER (PARTITION BY source ORDER BY bkt, doc_id
       |    ROWS UNBOUNDED PRECEDING) AS cum_tokens FROM bt),
       |tb AS (SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
       |  FROM bcum WHERE cum_tokens <= $E2eBudget),
       |d5 AS MATERIALIZED (SELECT d4.* FROM d4 WHERE doc_id IN (SELECT doc_id FROM tb)),
       |pt AS (SELECT doc_id, lang, CAST(len($toks) AS BIGINT) AS n_tokens FROM d5),
       |pf AS (SELECT doc_id, lang, doc_id % 16 AS shard, n_tokens FROM pt WHERE n_tokens > 0),
       |po AS (SELECT *, CAST(COALESCE(SUM(n_tokens) OVER (
       |    PARTITION BY lang, shard ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset FROM pf),
       |pk AS (SELECT doc_id, lang, CAST(shard AS BIGINT) AS pack_shard, n_tokens, tok_offset,
       |  CAST(tok_offset // 2048 AS BIGINT) AS first_pack,
       |  CAST((tok_offset + n_tokens - 1) // 2048 AS BIGINT) AS last_pack FROM po),
       |sk AS (SELECT doc_id, ${Portable.shuffleKeyDuck("doc_id")} AS shuffle_key FROM d5),
       |ssh AS (SELECT doc_id, CAST(shuffle_key % 16 AS INT) AS shard,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY shuffle_key % 16
       |    ORDER BY shuffle_key, doc_id) AS BIGINT) AS pos_in_shard FROM sk)
       |SELECT pk.doc_id, tb.source, pk.lang, pk.n_tokens, tb.cum_tokens,
       |  pk.pack_shard, pk.tok_offset, pk.first_pack, pk.last_pack,
       |  ssh.shard, ssh.pos_in_shard
       |FROM pk JOIN tb ON pk.doc_id = tb.doc_id JOIN ssh ON pk.doc_id = ssh.doc_id""".stripMargin
  }

  private val langCase =
    """CASE
      |  WHEN r_en = 0 AND r_es = 0 AND r_de = 0 AND r_fr = 0 THEN 'unknown'
      |  WHEN r_en >= r_es AND r_en >= r_de AND r_en >= r_fr THEN 'en'
      |  WHEN r_es >= r_de AND r_es >= r_fr THEN 'es'
      |  WHEN r_de >= r_fr THEN 'de'
      |  ELSE 'fr'
      |END""".stripMargin

  private val languageIdSql =
    s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
       |r AS (SELECT doc_id,
       |  ${Portable.stopRatioDuck("toks", Portable.StopEn)} AS r_en,
       |  ${Portable.stopRatioDuck("toks", Portable.StopEs)} AS r_es,
       |  ${Portable.stopRatioDuck("toks", Portable.StopDe)} AS r_de,
       |  ${Portable.stopRatioDuck("toks", Portable.StopFr)} AS r_fr
       |FROM t)
       |SELECT doc_id, $langCase AS lang_pred, r_en, r_es, r_de, r_fr FROM r""".stripMargin

  private val qualityScoreSql =
    s"""WITH t AS (SELECT doc_id, text, $toks AS toks FROM documents),
       |c AS (SELECT doc_id, text, toks,
       |  len(toks) AS n_tokens, len(list_distinct(toks)) AS n_distinct,
       |  ${Portable.stopRatioDuck("toks", Portable.StopEn)} AS stop_ratio,
       |  length(regexp_replace(text, '[^a-z ]', '', 'g')) AS alpha_chars
       |FROM t),
       |m AS (SELECT doc_id, n_tokens, n_distinct, stop_ratio,
       |  CASE WHEN length(text) > 0 THEN alpha_chars::DOUBLE / length(text) ELSE 0::DOUBLE END AS alpha_ratio,
       |  CASE WHEN n_tokens > 0 THEN n_distinct::DOUBLE / n_tokens ELSE 0::DOUBLE END AS diversity
       |FROM c)
       |SELECT doc_id, n_tokens, n_distinct, stop_ratio, alpha_ratio, diversity,
       |  (CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END) +
       |  (CASE WHEN stop_ratio > 0 THEN 1.0 ELSE 0.0 END) + diversity + alpha_ratio AS quality_score
       |FROM m""".stripMargin

  /** The training-replay CTE chain (labels → features → ep1..ep3), shared by
    * the trajectory gate and the serve gate. `fx` feeds every epoch AND the
    * serve gate's margin scan — AS MATERIALIZED per the CLAUDE.md
    * multi-referenced-CTE rule. Epoch 1 starts from w = 0: every featured
    * doc has margin 0 and updates. */
  private val qualityClassifierCtes = {
    val B = 64
    def margins(wt: String) =
      s"SELECT doc_id, y, SUM(x * COALESCE($wt.w, 0)) AS m " +
        s"FROM fx LEFT JOIN $wt USING (b) GROUP BY doc_id, y"
    def deltas(mt: String) =
      s"SELECT b, CAST(SUM(y * x) AS BIGINT) AS dw FROM fx " +
        s"WHERE doc_id IN (SELECT doc_id FROM $mt WHERE y * m <= 0) GROUP BY b"
    s"""t AS (SELECT doc_id, text, $toks AS toks FROM documents),
       |c AS (SELECT doc_id, text, toks,
       |  len(toks) AS n_tokens, len(list_distinct(toks)) AS n_distinct,
       |  ${Portable.stopRatioDuck("toks", Portable.StopEn)} AS stop_ratio,
       |  length(regexp_replace(text, '[^a-z ]', '', 'g')) AS alpha_chars
       |FROM t),
       |q AS (SELECT doc_id, toks,
       |  (CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END) +
       |  (CASE WHEN stop_ratio > 0 THEN 1.0 ELSE 0.0 END) +
       |  CASE WHEN n_tokens > 0 THEN n_distinct::DOUBLE / n_tokens ELSE 0::DOUBLE END +
       |  CASE WHEN length(text) > 0 THEN alpha_chars::DOUBLE / length(text) ELSE 0::DOUBLE END AS qs
       |FROM c),
       |lab AS (SELECT doc_id, toks, CASE WHEN qs >= 2.0 THEN 1 ELSE -1 END AS y FROM q),
       |fx AS MATERIALIZED (SELECT doc_id, y,
       |    (${Portable.phashDuck("tok")}) % $B AS b, CAST(COUNT(*) AS BIGINT) AS x
       |  FROM (SELECT doc_id, y, unnest(toks) AS tok FROM lab) GROUP BY 1, 2, 3),
       |ep1 AS MATERIALIZED (SELECT b, CAST(SUM(y * x) AS BIGINT) AS w FROM fx GROUP BY b),
       |m2 AS (${margins("ep1")}),
       |d2 AS (${deltas("m2")}),
       |ep2 AS MATERIALIZED (SELECT ep1.b, CAST(ep1.w + COALESCE(d2.dw, 0) AS BIGINT) AS w
       |  FROM ep1 LEFT JOIN d2 USING (b)),
       |m3 AS (${margins("ep2")}),
       |d3 AS (${deltas("m3")}),
       |ep3 AS MATERIALIZED (SELECT ep2.b, CAST(ep2.w + COALESCE(d3.dw, 0) AS BIGINT) AS w
       |  FROM ep2 LEFT JOIN d3 USING (b))""".stripMargin
  }

  /** Unrolled replica of [[Classifier.qualityPerceptron]] (64 buckets,
    * 3 epochs): the label chain is [[qualityScoreSql]]'s arithmetic, the
    * feature table is the portable token hash mod 64, and each epoch is one
    * margin CTE + one delta CTE + one weight CTE — all BIGINT, so the whole
    * training trajectory hash-checks. */
  private val qualityClassifierSql =
    s"""WITH $qualityClassifierCtes,
       |spine AS (SELECT CAST(range AS BIGINT) AS bucket FROM range(0, 64))
       |SELECT spine.bucket,
       |  CAST(COALESCE(ep1.w, 0) AS BIGINT) AS w1,
       |  CAST(COALESCE(ep2.w, 0) AS BIGINT) AS w2,
       |  CAST(COALESCE(ep3.w, 0) AS BIGINT) AS w3
       |FROM spine
       |LEFT JOIN ep1 ON ep1.b = spine.bucket
       |LEFT JOIN ep2 ON ep2.b = spine.bucket
       |LEFT JOIN ep3 ON ep3.b = spine.bucket""".stripMargin

  /** Replica of [[Classifier.scorePerceptron]] against the epoch-3 weights:
    * the same training replay, then one margin scan over the feature table
    * (fx is per-(doc, label, bucket), and the label is functionally
    * determined by the doc, so it doubles as the serve-side feature table).
    * Docs with no features (empty text) score margin 0, pred false — the
    * LEFT JOIN from `documents` restores them, as the Spark side does. */
  private val qualityClassifierServeSql =
    s"""WITH $qualityClassifierCtes,
       |sm AS (SELECT doc_id, CAST(SUM(x * COALESCE(ep3.w, 0)) AS BIGINT) AS margin
       |  FROM fx LEFT JOIN ep3 ON ep3.b = fx.b GROUP BY doc_id)
       |SELECT d.doc_id, CAST(COALESCE(sm.margin, 0) AS BIGINT) AS margin,
       |  COALESCE(sm.margin, 0) > 0 AS pred
       |FROM documents d LEFT JOIN sm USING (doc_id)""".stripMargin

  private val corpusStatsSql =
    s"""WITH t AS (SELECT doc_id, source, text, $toks AS toks FROM documents),
       |c AS (SELECT doc_id, source, text, toks,
       |  len(toks) AS n_tokens, len(list_distinct(toks)) AS n_distinct,
       |  ${Portable.stopRatioDuck("toks", Portable.StopEn)} AS stop_ratio,
       |  length(regexp_replace(text, '[^a-z ]', '', 'g')) AS alpha_chars
       |FROM t),
       |m AS (SELECT doc_id, source, n_tokens, n_distinct,
       |  (CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END) +
       |  (CASE WHEN stop_ratio > 0 THEN 1.0 ELSE 0.0 END) +
       |  CASE WHEN n_tokens > 0 THEN n_distinct::DOUBLE / n_tokens ELSE 0::DOUBLE END +
       |  CASE WHEN length(text) > 0 THEN alpha_chars::DOUBLE / length(text) ELSE 0::DOUBLE END AS quality_score
       |FROM c)
       |SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_tokens::BIGINT) AS BIGINT) AS total_tokens,
       |  CAST(SUM(n_distinct::BIGINT) AS BIGINT) AS total_distinct_tokens,
       |  MIN(quality_score) AS min_quality, MAX(quality_score) AS max_quality
       |FROM m GROUP BY source""".stripMargin

  private val trainSplitSql =
    s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents)
       |SELECT CASE WHEN ${Portable.splitBucketDuck("doc_id")} < 90 THEN 'train' ELSE 'test' END AS split,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(len(toks)::BIGINT) AS BIGINT) AS total_tokens
       |FROM t GROUP BY 1""".stripMargin

  /** Stratified replica: identical bucket hash, grouped by source, shares
    * via a per-stratum window over the aggregate. */
  private val trainSplitBySql =
    s"""WITH t AS (SELECT doc_id, source, $toks AS toks FROM documents),
       |s AS (SELECT source,
       |  CASE WHEN ${Portable.splitBucketDuck("doc_id")} < 90 THEN 'train' ELSE 'test' END AS split,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(len(toks)::BIGINT) AS BIGINT) AS total_tokens
       |FROM t GROUP BY 1, 2)
       |SELECT source, split, n_docs, total_tokens,
       |  CAST(n_docs AS DOUBLE)
       |    / CAST(SUM(n_docs) OVER (PARTITION BY source) AS DOUBLE) AS stratum_share
       |FROM s""".stripMargin

  /** Reuses the quality-score CTE chain; threshold = exact 25th percentile. */
  private val qualityFilterSql =
    s"""WITH t AS (SELECT doc_id, source, text, $toks AS toks FROM documents),
       |c AS (SELECT doc_id, source, text, toks,
       |  len(toks) AS n_tokens, len(list_distinct(toks)) AS n_distinct,
       |  ${Portable.stopRatioDuck("toks", Portable.StopEn)} AS stop_ratio,
       |  length(regexp_replace(text, '[^a-z ]', '', 'g')) AS alpha_chars
       |FROM t),
       |m AS (SELECT doc_id, source,
       |  (CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END) +
       |  (CASE WHEN stop_ratio > 0 THEN 1.0 ELSE 0.0 END) +
       |  CASE WHEN n_tokens > 0 THEN n_distinct::DOUBLE / n_tokens ELSE 0::DOUBLE END +
       |  CASE WHEN length(text) > 0 THEN alpha_chars::DOUBLE / length(text) ELSE 0::DOUBLE END AS quality_score
       |FROM c),
       |thr AS (SELECT quantile_cont(quality_score, 0.25) AS thr FROM m)
       |SELECT source, COUNT(*) AS n_docs_kept,
       |  MIN(quality_score) AS min_quality_kept,
       |  MAX(quality_score) AS max_quality_kept
       |FROM m, thr WHERE quality_score >= thr GROUP BY source""".stripMargin

  /** Mirror of [[TextOps.wordpieceSegment]]: the same integer-packed munch
    * fold ([[Portable.wordpieceStateDuck]]) over the distinct-word table,
    * joined back and aggregated per document. */
  private lazy val wordpieceSql =
    s"""WITH d AS (SELECT doc_id, $toks AS toks FROM documents),
       |tok AS (SELECT doc_id, unnest(toks) AS word FROM d),
       |dw AS (SELECT DISTINCT word FROM tok),
       |st AS (SELECT word, ${Portable.wordpieceStateDuck("word", WordpieceVocab)} AS st FROM dw),
       |seg AS MATERIALIZED (SELECT word,
       |  ${Portable.wordpiecePiecesDuck("st")} AS n_pieces,
       |  ${Portable.wordpieceUnkDuck("st")} AS is_unk FROM st)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  CAST(SUM(n_pieces) AS BIGINT) AS n_pieces,
       |  CAST(SUM(is_unk) AS BIGINT) AS n_unk_tokens,
       |  CAST(MAX(n_pieces) AS BIGINT) AS max_pieces_per_token,
       |  CAST(SUM(n_pieces) AS BIGINT)::DOUBLE / COUNT(*) AS pieces_per_token
       |FROM tok JOIN seg USING (word) GROUP BY doc_id""".stripMargin

  /** Mirror of [[TextOps.unigramSegment]]: the same integer-packed Viterbi
    * array fold ([[Portable.unigramStateDuck]]) over the distinct-word
    * table, joined back and aggregated per document. */
  private lazy val unigramSegmentSql =
    s"""WITH d AS (SELECT doc_id, $toks AS toks FROM documents),
       |tok AS (SELECT doc_id, unnest(toks) AS word FROM d),
       |dw AS (SELECT DISTINCT word FROM tok),
       |st AS (SELECT word, ${Portable.unigramStateDuck("word", UnigramVocab)} AS st FROM dw),
       |seg AS MATERIALIZED (SELECT word,
       |  ${Portable.unigramPiecesDuck("st")} AS n_pieces,
       |  ${Portable.unigramCostDuck("st")} AS cost,
       |  ${Portable.unigramUnkDuck("st")} AS is_unk FROM st)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  CAST(SUM(n_pieces) AS BIGINT) AS n_pieces,
       |  CAST(SUM(is_unk) AS BIGINT) AS n_unk_tokens,
       |  CAST(SUM(cost) AS BIGINT) AS total_cost,
       |  CAST(MAX(n_pieces) AS BIGINT) AS max_pieces_per_token,
       |  CAST(SUM(n_pieces) AS BIGINT)::DOUBLE / COUNT(*) AS pieces_per_token
       |FROM tok JOIN seg USING (word) GROUP BY doc_id""".stripMargin

  /** Mirror of [[TextOps.gopherRules]]: the same integer cross-multiplied
    * rule battery over the same constructed input. */
  private lazy val gopherRulesSql = {
    val stops = TextOps.GopherStops
      .map(s => s"(CASE WHEN list_contains(wds, '$s') THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH d0 AS (SELECT doc_id, $gopherInputDuck AS text FROM documents),
       |w AS (SELECT doc_id, text,
       |  list_filter(string_split(replace(text, chr(10), ' '), ' '), x -> x <> '') AS wds,
       |  string_split(text, chr(10)) AS ls FROM d0),
       |m AS (SELECT doc_id,
       |  CAST(len(wds) AS BIGINT) AS n_words,
       |  CAST(COALESCE(list_sum(list_transform(wds, x -> length(x))), 0) AS BIGINT) AS sumlen,
       |  CAST((length(text) - length(replace(text, '#', '')))
       |    + (length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT) AS sym,
       |  CAST(len(ls) AS BIGINT) AS nl,
       |  CAST(len(list_filter(ls, l -> l LIKE '- %' OR l LIKE '* %')) AS BIGINT) AS bul,
       |  CAST(len(list_filter(ls, l -> l LIKE '%...')) AS BIGINT) AS ell,
       |  CAST(len(list_filter(wds, t -> regexp_matches(t, '[a-z]'))) AS BIGINT) AS alpha,
       |  $stops AS stops
       |FROM w),
       |r AS (SELECT doc_id, n_words,
       |  n_words >= 50 AND n_words <= 100000 AS word_count_ok,
       |  3 * n_words <= sumlen AND sumlen <= 10 * n_words AS mean_word_len_ok,
       |  10 * sym <= n_words AS symbol_ratio_ok,
       |  10 * bul <= nl AS bullet_ok,
       |  10 * ell <= 3 * nl AS ellipsis_ok,
       |  5 * alpha >= 4 * n_words AS alpha_ok,
       |  stops >= 2 AS stop_ok FROM m)
       |SELECT doc_id, n_words, word_count_ok, mean_word_len_ok, symbol_ratio_ok,
       |  bullet_ok, ellipsis_ok, alpha_ok, stop_ok,
       |  word_count_ok AND mean_word_len_ok AND symbol_ratio_ok AND bullet_ok
       |    AND ellipsis_ok AND alpha_ok AND stop_ok AS keep
       |FROM r""".stripMargin
  }

  /** Mirror of [[TextOps.c4Clean]] (minSentences 3) over the same
    * constructed pages. */
  private lazy val c4CleanSql =
    s"""WITH d0 AS (SELECT doc_id, $c4InputDuck AS text FROM documents),
       |k AS (SELECT doc_id, text,
       |  list_filter(string_split(text, chr(10)), l ->
       |    (l LIKE '%.' OR l LIKE '%!' OR l LIKE '%?' OR l LIKE '%"')
       |    AND len(list_filter(string_split(l, ' '), w2 -> w2 <> '')) >= 3
       |    AND NOT l LIKE '%javascript%') AS kept,
       |  len(string_split(text, chr(10))) AS nl FROM d0),
       |c AS (SELECT doc_id, text, array_to_string(kept, chr(10)) AS clean_text,
       |  CAST(len(kept) AS BIGINT) AS n_lines_kept,
       |  CAST(nl - len(kept) AS BIGINT) AS n_lines_dropped FROM k),
       |s AS (SELECT *, CAST(length(clean_text)
       |  - length(regexp_replace(clean_text, '[.!?]', '', 'g')) AS BIGINT) AS n_sentences FROM c),
       |v AS (SELECT *, CASE WHEN text LIKE '%lorem ipsum%' THEN 'lorem_ipsum'
       |  WHEN text LIKE '%{%' THEN 'brace'
       |  WHEN n_sentences < 3 THEN 'few_sentences' ELSE 'keep' END AS page_reason FROM s)
       |SELECT doc_id, clean_text, n_lines_kept, n_lines_dropped, n_sentences,
       |  page_reason = 'keep' AS page_keep, page_reason FROM v""".stripMargin

  /** Mirror of [[TextOps.qualityFilterByDomain]]: the same quality chain
    * with the quantile computed PER SOURCE. */
  private val qualityFilterDomainSql =
    s"""WITH t AS (SELECT doc_id, source, text, $toks AS toks FROM documents),
       |c AS (SELECT doc_id, source, text, toks,
       |  len(toks) AS n_tokens, len(list_distinct(toks)) AS n_distinct,
       |  ${Portable.stopRatioDuck("toks", Portable.StopEn)} AS stop_ratio,
       |  length(regexp_replace(text, '[^a-z ]', '', 'g')) AS alpha_chars
       |FROM t),
       |m AS (SELECT doc_id, source,
       |  (CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END) +
       |  (CASE WHEN stop_ratio > 0 THEN 1.0 ELSE 0.0 END) +
       |  CASE WHEN n_tokens > 0 THEN n_distinct::DOUBLE / n_tokens ELSE 0::DOUBLE END +
       |  CASE WHEN length(text) > 0 THEN alpha_chars::DOUBLE / length(text) ELSE 0::DOUBLE END AS quality_score
       |FROM c),
       |thr AS (SELECT source, quantile_cont(quality_score, 0.25) AS thr
       |  FROM m GROUP BY source)
       |SELECT m.source, MIN(thr.thr) AS domain_threshold,
       |  COUNT(*) AS n_docs_kept,
       |  MIN(quality_score) AS min_quality_kept,
       |  MAX(quality_score) AS max_quality_kept
       |FROM m JOIN thr ON m.source = thr.source
       |WHERE quality_score >= thr.thr GROUP BY m.source""".stripMargin

  /** Mirror of [[TextOps.contamination]]: same split arithmetic, same
    * distinct word-8-gram sets, equi-join on the shingle string. */
  private val contaminationSql =
    s"""WITH t AS (SELECT doc_id, $toks AS toks,
       |  CASE WHEN ${Portable.splitBucketDuck("doc_id")} < 90 THEN 'train' ELSE 'test' END AS split
       |FROM documents),
       |sh AS (SELECT doc_id, split,
       |  unnest(list_distinct(${Portable.shinglesDuck("toks", 8)})) AS s FROM t)
       |SELECT a.doc_id AS test_doc, b.doc_id AS train_doc, COUNT(*) AS n_shared_ngrams
       |FROM sh a JOIN sh b ON a.s = b.s AND a.split = 'test' AND b.split = 'train'
       |GROUP BY 1, 2""".stripMargin

  /** Mirror of [[graft.operators.Dedup.minhashContamination]]: the banded
    * candidates' verified output equals the exact cross-split trigram
    * Jaccard (the [[jaccardSql]] contract restricted to pairs straddling
    * the split boundary), so the oracle is the exact join — same split
    * arithmetic as [[contaminationSql]], same set algebra as the dedup
    * family's replica. */
  private val contaminationFuzzySql =
    s"""WITH t AS (SELECT doc_id, $toks AS toks,
       |  CASE WHEN ${Portable.splitBucketDuck("doc_id")} < 90 THEN 'train' ELSE 'test' END AS split
       |FROM documents),
       |sets AS (SELECT doc_id, split, list_distinct(${Portable.shinglesDuck("toks", 3)}) AS sh FROM t),
       |sets2 AS MATERIALIZED (SELECT doc_id, split, sh, len(sh) AS n FROM sets WHERE len(sh) > 0),
       |shr AS (SELECT doc_id, split, unnest(sh) AS s FROM sets2),
       |pr AS (SELECT a.doc_id AS test_doc, b.doc_id AS train_doc, COUNT(*) AS inter
       |  FROM shr a JOIN shr b ON a.s = b.s AND a.split = 'test' AND b.split = 'train'
       |  GROUP BY 1, 2)
       |SELECT test_doc, train_doc, jaccard FROM (
       |  SELECT test_doc, train_doc, inter::DOUBLE / (x.n + y.n - inter) AS jaccard
       |  FROM pr JOIN sets2 x ON test_doc = x.doc_id JOIN sets2 y ON train_doc = y.doc_id)
       |WHERE jaccard >= $JaccardTau""".stripMargin

  /** Mirror of [[graft.operators.Retrieval.hardNegatives]]: brute-force
    * cosine ranking with the anchor's exact-twin (md5) and verified
    * near-dup (exact all-pairs Jaccard >= tau) partners anti-joined out
    * before the rank — the banded operator equals the all-pairs replica by
    * the minhash recall contract. */
  private lazy val hardNegativesSql =
    s"""WITH $jaccardCtes,
       |jp AS MATERIALIZED ($jaccardSelect),
       |nx AS (SELECT doc_a AS query_id, doc_b AS neighbor_id FROM jp WHERE doc_a < $NQueries
       |  UNION SELECT doc_b, doc_a FROM jp WHERE doc_b < $NQueries),
       |kk AS MATERIALIZED (SELECT doc_id, md5(text) AS kk FROM documents),
       |xx AS (SELECT a.doc_id AS query_id, b.doc_id AS neighbor_id
       |  FROM kk a JOIN kk b ON a.kk = b.kk AND a.doc_id <> b.doc_id
       |  WHERE a.doc_id < $NQueries),
       |ex AS MATERIALIZED (SELECT query_id, neighbor_id FROM nx
       |  UNION SELECT query_id, neighbor_id FROM xx),
       |e AS MATERIALIZED (SELECT vec_id, embedding, ${Portable.normDuck("embedding")} AS nrm FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS emb_q, nrm AS norm_q FROM e WHERE vec_id < $NQueries),
       |s AS (SELECT q.query_id, v.vec_id AS neighbor_id,
       |    (${Portable.dotDuck("emb_q", "v.embedding")}) / (norm_q * v.nrm) AS cosine
       |  FROM e v CROSS JOIN q
       |  WHERE v.vec_id <> q.query_id
       |    AND NOT EXISTS (SELECT 1 FROM ex
       |      WHERE ex.query_id = q.query_id AND ex.neighbor_id = v.vec_id)),
       |r AS (SELECT query_id, neighbor_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rnk
       |  FROM s)
       |SELECT query_id, neighbor_id, cosine, rnk FROM r WHERE rnk <= $TopK""".stripMargin

  /** Unrolled-CTE replica of [[TextOps.domainMixtureWeights]]: the
    * per-domain fixed-point surprisal loss, then one (lbar, update,
    * renormalize) CTE triple per round — same BIGINT arithmetic, with the
    * CASE guard keeping every `//` on non-negative operands (DuckDB floors,
    * Spark truncates; they agree only above zero). Multi-referenced CTEs
    * are MATERIALIZED (the chain-root rule). */
  /** The shared CTE body (loss table + every MW round through
    * w`MixtureIters`) — reused by the trajectory oracle and the
    * learned-mixture application oracle. */
  private val domainMixtureCtes: String = {
    val S = 1000000L; val W = 1000000L; val etaNum = 8L; val etaDen = 1L
    val rounds = (1 to MixtureIters).map { i =>
      val pw = s"w${i - 1}"
      s"""a$i AS (SELECT CAST(SUM(weight * loss_fp) AS BIGINT) // CAST(SUM(weight) AS BIGINT) AS lbar
         |  FROM $pw JOIN l USING (source)),
         |u$i AS MATERIALIZED (SELECT source,
         |    weight * (CASE WHEN mn <= 0 THEN 1 ELSE greatest(1, mn // $etaDen) END) // $W AS w1
         |  FROM (SELECT w.source, w.weight,
         |      $W * $etaDen + (l.loss_fp - a$i.lbar) * $etaNum AS mn
         |    FROM $pw w JOIN l USING (source) CROSS JOIN a$i)),
         |s$i AS (SELECT CAST(SUM(w1) AS BIGINT) AS s1 FROM u$i),
         |w$i AS MATERIALIZED (SELECT source, w1 * mass // s1 AS weight
         |  FROM u$i CROSS JOIN m CROSS JOIN s$i)""".stripMargin
    }.mkString(",\n")
    s"""docs AS (SELECT source, $toks AS toks FROM documents),
       |tok AS (SELECT source, unnest(toks) AS t FROM docs),
       |tf AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY t),
       |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM tf),
       |l AS MATERIALIZED (SELECT source, sum_bits * $S // n_tokens AS loss_fp FROM (
       |  SELECT source, CAST(SUM(bits) AS BIGINT) AS sum_bits,
       |    CAST(COUNT(*) AS BIGINT) AS n_tokens
       |  FROM (SELECT source, CAST(length(printf('%b', total // cnt)) - 1 AS BIGINT) AS bits
       |    FROM tok JOIN tf USING (t) CROSS JOIN tot)
       |  GROUP BY source)),
       |m AS (SELECT CAST(COUNT(*) AS BIGINT) * $W AS mass FROM l),
       |w0 AS MATERIALIZED (SELECT source, CAST($W AS BIGINT) AS weight FROM l),
       |$rounds""".stripMargin
  }

  private val domainMixtureSql = {
    val union = (0 to MixtureIters).map { i =>
      s"""SELECT CAST($i AS INTEGER) AS round, source, weight,
         |  CAST(weight AS DOUBLE) / CAST(mass AS DOUBLE) AS share
         |FROM w$i CROSS JOIN m""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"WITH $domainMixtureCtes\n$union"
  }

  /** Mirror of [[TextOps.mixtureSampleByWeights]] over the learned final
    * round: max-normalized integer 1/10000 thresholds, same BIGINT
    * arithmetic, same deterministic sample bucket. */
  private val mixtureLearnedSql =
    s"""WITH $domainMixtureCtes,
       |mw AS (SELECT CAST(MAX(weight) AS BIGINT) AS wmax FROM w$MixtureIters),
       |thr AS (SELECT source, weight * 10000 // wmax AS thr
       |  FROM w$MixtureIters CROSS JOIN mw)
       |SELECT d.doc_id, d.source FROM documents d JOIN thr ON d.source = thr.source
       |WHERE ${Portable.sampleBucketDuck("d.doc_id")} < thr.thr""".stripMargin

  /** Mirror of [[TextOps.packSequences]] (budget 2048, 16 shards): the
    * SUM window is cast back to BIGINT (DuckDB window SUM promotes to
    * HUGEINT, which the driver's Arrow fetch renders differently). */
  private val packSequencesSql =
    s"""WITH t AS (SELECT doc_id, lang, len($toks)::BIGINT AS n_tokens FROM documents),
       |f AS (SELECT doc_id, lang, doc_id % 16 AS shard, n_tokens FROM t WHERE n_tokens > 0),
       |o AS (SELECT *, CAST(COALESCE(SUM(n_tokens) OVER (
       |    PARTITION BY lang, shard ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
       |  FROM f)
       |SELECT doc_id, lang, shard, n_tokens, tok_offset,
       |  tok_offset // 2048 AS first_pack,
       |  (tok_offset + n_tokens - 1) // 2048 AS last_pack
       |FROM o""".stripMargin

  /** Shared CTE body of the best-fit packing oracles: EXACT replay of
    * [[graft.operators.TextOps.bestFitPack]]'s bounded-space
    * best-fit-decreasing loop as a recursive CTE — every stream advances one
    * ranked doc per iteration carrying its open-bin pool (a
    * list<struct(rem, id)>, ≤ maxOpen entries) and bin counter as recursive
    * state. `list_sort` over struct(rem, id) is DuckDB's lexicographic
    * struct order = the operator's (smallest remainder, tie lowest id) rule
    * for BOTH the fit choice and the bounded-pool eviction, so the replayed
    * fit is bit-identical. The fit is deterministic per (lang, shard)
    * stream, which is what makes a full-replica oracle possible at all. */
  private lazy val bestFitCtes = {
    val B = BfBudget; val S = BfShards; val M = BfMaxOpen
    s"""bfd AS (SELECT doc_id, lang,
       |    CASE WHEN doc_id % 13 = 0 THEN text || repeat(' padtok', 100)
       |         ELSE text END AS text
       |  FROM documents),
       |bfb AS (SELECT doc_id, lang, doc_id % $S AS shard, n
       |  FROM (SELECT doc_id, lang, len($toks)::BIGINT AS n FROM bfd)
       |  WHERE n > 0),
       |bfr AS MATERIALIZED (SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY lang, shard ORDER BY n DESC, doc_id) AS r FROM bfb),
       |bfs AS (SELECT DISTINCT lang, shard FROM bfr),
       |bfst(lang, shard, r, doc_id, n, bin, oversize, bins, nxt) AS (
       |  SELECT lang, shard, CAST(0 AS BIGINT), CAST(NULL AS BIGINT),
       |    CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BOOLEAN),
       |    CAST([] AS STRUCT(rem BIGINT, id BIGINT)[]), CAST(0 AS BIGINT)
       |  FROM bfs
       |  UNION ALL
       |  SELECT lang, shard, r, doc_id, n,
       |    CASE WHEN n > $B THEN pn
       |         WHEN len(fit) > 0 THEN fit[1].id ELSE pn END,
       |    n > $B,
       |    CASE WHEN n > $B THEN pb
       |         WHEN len(fit) > 0 THEN
       |           CASE WHEN fit[1].rem = n
       |                THEN list_filter(pb, x -> x.id <> fit[1].id)
       |                ELSE list_append(list_filter(pb, x -> x.id <> fit[1].id),
       |                       struct_pack(rem := fit[1].rem - n, id := fit[1].id)) END
       |         WHEN n = $B THEN pb
       |         WHEN len(pb) >= $M
       |           THEN list_filter(ap, x -> x.id <> list_sort(ap)[1].id)
       |         ELSE ap END,
       |    CASE WHEN n > $B OR len(fit) = 0 THEN pn + 1 ELSE pn END
       |  FROM (SELECT k.lang, k.shard, k.r, k.doc_id, k.n,
       |          s.bins AS pb, s.nxt AS pn,
       |          list_sort(list_filter(s.bins, x -> x.rem >= k.n)) AS fit,
       |          list_append(s.bins,
       |            struct_pack(rem := $B - k.n, id := s.nxt)) AS ap
       |        FROM bfst s JOIN bfr k
       |          ON k.lang IS NOT DISTINCT FROM s.lang
       |          AND k.shard = s.shard AND k.r = s.r + 1))""".stripMargin
  }

  private lazy val bestFitPackSql =
    s"""WITH RECURSIVE $bestFitCtes
       |SELECT doc_id, lang, shard, n AS n_tokens, bin, oversize
       |FROM bfst WHERE r > 0""".stripMargin

  private lazy val bestFitWasteSql =
    s"""WITH RECURSIVE $bestFitCtes,
       |bfp AS (SELECT lang, shard, bin, oversize,
       |    COUNT(*)::BIGINT AS docs, CAST(SUM(n) AS BIGINT) AS toks
       |  FROM bfst WHERE r > 0 GROUP BY 1, 2, 3, 4)
       |SELECT lang, shard, CAST(SUM(docs) AS BIGINT) AS n_docs,
       |  COUNT(*)::BIGINT AS n_bins, CAST(SUM(toks) AS BIGINT) AS total_tokens,
       |  CAST(SUM(CASE WHEN oversize THEN 1 ELSE 0 END) AS BIGINT) AS n_oversize,
       |  CAST(SUM(CASE WHEN oversize THEN 0 ELSE $BfBudget - toks END) AS BIGINT)
       |    AS padded_tokens
       |FROM bfp GROUP BY 1, 2""".stripMargin

  /** The shared BM25-chain CTE prefix (btok → bperdoc → bstats → bscored) —
    * ONE source of truth for the rational-idf BM25 arithmetic, referenced by
    * both [[bm25Sql]] and [[hybridRrfIndexSql]]. `bperdoc` feeds bstats AND
    * bscored, so it is AS MATERIALIZED (the multi-referenced-CTE rule). */
  private val bm25ScoredCtes = {
    val tfCols = Bm25Terms.map(t =>
      s"COUNT(*) FILTER (WHERE t = '$t')::DOUBLE AS tf_$t").mkString(", ")
    val dfCols = Bm25Terms.map(t =>
      s"SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END)::DOUBLE AS df_$t").mkString(", ")
    val score = Bm25Terms.map(t => Portable.bm25Term(s"tf_$t", s"df_$t", 1.5, 0.75))
      .mkString(" + ")
    val out = Bm25Terms.map(t => s"tf_$t").mkString(", ")
    s"""btok AS (SELECT doc_id, unnest($toks) AS t FROM documents),
       |bperdoc AS MATERIALIZED (SELECT doc_id, COUNT(*)::DOUBLE AS dl, $tfCols FROM btok GROUP BY doc_id),
       |bstats AS (SELECT COUNT(*)::DOUBLE AS n, SUM(dl) / COUNT(*) AS avgdl, $dfCols FROM bperdoc),
       |bscored AS (SELECT doc_id, dl, $out, $score AS score FROM bperdoc, bstats)""".stripMargin
  }

  /** Mirror of [[TextOps.bm25Search]]: same per-doc tf aggregate, same
    * one-row stats, same rational-idf score arithmetic, same top-k order. */
  private val bm25Sql = {
    val out = Bm25Terms.map(t => s"tf_$t").mkString(", ")
    s"""WITH $bm25ScoredCtes
       |SELECT doc_id, dl, $out, score
       |FROM bscored
       |ORDER BY score DESC, doc_id LIMIT 50""".stripMargin
  }

  /** Mirror of [[TextOps.tfidfSearch]]: same wide conditional counts, same
    * integer bit-width idf (printf('%b', x) length == conv-base-2 length),
    * same BIGINT score — the retrieval ranking itself hash-checks. */
  /** The shared tfidf-chain CTE prefix (tok → perdoc → stats → scored) —
    * ONE source of truth for the integer-idf formula, referenced by both
    * [[tfidfSql]] and [[hybridRrfSql]]. `perdoc` feeds stats AND scored, so
    * it is AS MATERIALIZED (the CLAUDE.md multi-referenced-CTE rule —
    * un-materialized, DuckDB re-tokenizes the corpus per reference). */
  private val tfidfScoredCtes = {
    val tfCols = Bm25Terms.map(t =>
      s"CAST(COUNT(*) FILTER (WHERE t = '$t') AS BIGINT) AS tf_$t").mkString(", ")
    val dfCols = Bm25Terms.map(t =>
      s"CAST(SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$t").mkString(", ")
    val score = Bm25Terms.map(t =>
      s"(CASE WHEN df_$t > 0 THEN tf_$t * length(printf('%b', n // df_$t)) ELSE 0 END)")
      .mkString(" + ")
    val out = Bm25Terms.map(t => s"tf_$t").mkString(", ")
    s"""tok AS (SELECT doc_id, unnest($toks) AS t FROM documents),
       |perdoc AS MATERIALIZED (SELECT doc_id, $tfCols FROM tok GROUP BY doc_id),
       |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, $dfCols FROM perdoc),
       |scored AS (SELECT doc_id, $out, CAST($score AS BIGINT) AS score FROM perdoc, stats)""".stripMargin
  }

  private val tfidfSql =
    s"""WITH $tfidfScoredCtes
       |SELECT * FROM scored WHERE score > 0
       |ORDER BY score DESC, doc_id LIMIT 50""".stripMargin

  /** Oracle twin of extractMeta(syntheticMedia(documents)): Spark built a
    * REAL container header (PNG/WAV/JPEG — [[Multimodal.syntheticMedia]])
    * from doc_id arithmetic and must parse those bytes back; the oracle
    * reproduces every decoded field from the same arithmetic. format must
    * match what magic-byte sniffing found, n_bytes is the fixed per-format
    * header length (PNG 33 = signature+IHDR chunk, WAV 44 = RIFF+fmt+data
    * preamble, JPEG 39 = SOI+APP0+SOF0) plus the ASCII payload length, and
    * the byte-wise payload checksum equals the codepoint-wise portable hash
    * because the corpus is pure ASCII (strlen = length for every row —
    * verified at both SFs). */
  private val multimodalMetaSql =
    s"""SELECT doc_id AS media_id,
       |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
       |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'jpeg' END AS format,
       |  CAST((doc_id % 1024) + 16 AS INTEGER) AS width,
       |  CAST((doc_id % 768) + 16 AS INTEGER) AS height,
       |  CAST(CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 33 WHEN 1 THEN 44 ELSE 39 END
       |    + strlen(text) AS BIGINT) AS n_bytes,
       |  ${Portable.phashDuck("text")} AS checksum
       |FROM documents""".stripMargin

  /** Oracle twin of decodeSamples(syntheticPixelMedia(documents)): Spark
    * built a real zlib-compressed PNG / PCM16 WAV per document and decoded
    * the BYTES back ([[Multimodal.decodePngPixels]]/[[Multimodal
    * .decodeWavSamples]]); the oracle reproduces the decoded value stream
    * from the generating arithmetic ([[Multimodal.pngPixel]] 16x8 grayscale,
    * [[Multimodal.wavSample]] 64 signed samples) — all-integer sums, bounds,
    * and the polynomial checksum over unsigned-16 value representations. */
  /** Arithmetic twin of [[Multimodal.perceptualNearDups]] over the 16x8
    * synthetic PNG corpus: dHash bit (i, j) compares pixel (i, 2j) with
    * (i, 2j+1) of the deterministic pixel model (the general floor(i*h/8) /
    * floor(j*w/8) sampling collapses to that at 16x8); the oracle
    * brute-forces all pairs — the blocking strategy is Spark-side scale
    * shape, invisible in the verified output. `h` is MATERIALIZED: it feeds
    * both sides of the pair join and the final report. */
  private val multimodalNearDupSql =
    s"""WITH img AS (SELECT doc_id AS media_id FROM documents WHERE doc_id % 3 = 0),
       |b AS (SELECT media_id, (i * 8 + j) AS k,
       |  CASE WHEN ((media_id * 31 + i * 17 + (2 * j) * 7) % 256) <
       |            ((media_id * 31 + i * 17 + (2 * j + 1) * 7) % 256)
       |       THEN 1::BIGINT ELSE 0::BIGINT END AS bit
       |  FROM img CROSS JOIN range(8) t1(i) CROSS JOIN range(8) t2(j)),
       |h AS MATERIALIZED (SELECT media_id,
       |  CAST(SUM(CASE WHEN k >= 32 THEN bit << (k - 32) ELSE 0 END) AS BIGINT) AS dhash_hi,
       |  CAST(SUM(CASE WHEN k < 32 THEN bit << k ELSE 0 END) AS BIGINT) AS dhash_lo
       |  FROM b GROUP BY media_id),
       |p AS (SELECT x.media_id AS a, y.media_id AS b
       |  FROM h x JOIN h y ON x.media_id <> y.media_id
       |  AND bit_count(xor(x.dhash_hi, y.dhash_hi)) +
       |      bit_count(xor(x.dhash_lo, y.dhash_lo)) <= $MaxHamming),
       |agg AS (SELECT a AS media_id, CAST(COUNT(*) AS BIGINT) AS n_near_dups,
       |  MIN(b) AS min_dup_id FROM p GROUP BY a)
       |SELECT media_id, dhash_hi, dhash_lo,
       |  COALESCE(n_near_dups, 0::BIGINT) AS n_near_dups, min_dup_id
       |FROM h LEFT JOIN agg USING (media_id)""".stripMargin

  /** Arithmetic twin of [[Multimodal.audioNearDups]] over the synthetic WAV
    * corpus (64 PCM16 samples, model [[Multimodal.wavSample]]): the Haar
    * pyramid is computed by LEVELS — pair sums/diffs (q2), quad sums/diffs
    * (q4), then the four frame band energies — and the fingerprint bit
    * (t, b) compares band b's energy against the NEXT frame's (mod 8),
    * packed at k = t*4 + b. The oracle brute-forces ALL pairs; Spark's
    * distinct-fingerprint contraction must produce the identical report.
    * `h` is MATERIALIZED: both sides of the pair join and the final report
    * read it (CLAUDE.md: multi-referenced CTE feeding a chain). */
  private val multimodalAudioNearDupSql =
    s"""WITH aud AS (SELECT doc_id AS media_id FROM documents WHERE doc_id % 3 = 1),
       |v AS (SELECT media_id, (media_id * 131 + i * 17) % 4096 - 2048 AS s,
       |  i // 8 AS t, i % 8 AS p FROM aud CROSS JOIN range(64) r(i)),
       |p2 AS (SELECT media_id, t, p // 2 AS q2,
       |  SUM(CASE WHEN p % 2 = 0 THEN s ELSE -s END) AS d2, SUM(s) AS a2
       |  FROM v GROUP BY 1, 2, 3),
       |p4 AS (SELECT media_id, t, q2 // 2 AS q4,
       |  SUM(CASE WHEN q2 % 2 = 0 THEN a2 ELSE -a2 END) AS d4, SUM(a2) AS a4,
       |  SUM(ABS(d2)) AS e3p
       |  FROM p2 GROUP BY 1, 2, 3),
       |fr AS (SELECT media_id, t,
       |  ABS(SUM(a4)) AS e0,
       |  ABS(SUM(CASE WHEN q4 % 2 = 0 THEN a4 ELSE -a4 END)) AS e1,
       |  SUM(ABS(d4)) AS e2, SUM(e3p) AS e3
       |  FROM p4 GROUP BY 1, 2),
       |bits AS (SELECT x.media_id, x.t, rb.b,
       |  CASE WHEN (CASE rb.b WHEN 0 THEN x.e0 WHEN 1 THEN x.e1
       |             WHEN 2 THEN x.e2 ELSE x.e3 END) >
       |            (CASE rb.b WHEN 0 THEN y.e0 WHEN 1 THEN y.e1
       |             WHEN 2 THEN y.e2 ELSE y.e3 END)
       |       THEN 1::BIGINT ELSE 0::BIGINT END AS bit
       |  FROM fr x JOIN fr y ON x.media_id = y.media_id AND y.t = (x.t + 1) % 8
       |  CROSS JOIN range(4) rb(b)),
       |h AS MATERIALIZED (SELECT media_id,
       |  CAST(SUM(bit << (t * 4 + b)) AS BIGINT) AS afp FROM bits GROUP BY 1),
       |p AS (SELECT x.media_id AS a, y.media_id AS b FROM h x JOIN h y
       |  ON x.media_id <> y.media_id
       |  AND bit_count(xor(x.afp, y.afp)) <= $MaxHamming),
       |agg AS (SELECT a AS media_id, CAST(COUNT(*) AS BIGINT) AS n_near_dups,
       |  MIN(b) AS min_dup_id FROM p GROUP BY 1)
       |SELECT media_id, afp, COALESCE(n_near_dups, 0::BIGINT) AS n_near_dups,
       |  min_dup_id
       |FROM h LEFT JOIN agg USING (media_id)""".stripMargin

  private val multimodalPixelsSql =
    s"""WITH m AS (SELECT doc_id, CAST(doc_id % 3 AS INT) AS m3 FROM documents
       |  WHERE doc_id % 3 <> 2),
       |v AS (SELECT doc_id,
       |  CASE WHEN m3 = 0 THEN 'png' ELSE 'wav' END AS kind,
       |  CASE WHEN m3 = 0
       |    THEN [(doc_id * 31 + (i // 16) * 17 + (i % 16) * 7) % 256 for i in range(0, 128)]
       |    ELSE [(doc_id * 131 + i * 17) % 4096 - 2048 for i in range(0, 64)]
       |  END AS vals FROM m)
       |SELECT doc_id AS media_id, kind,
       |  CAST(len(vals) AS BIGINT) AS n_values,
       |  CAST(list_reduce(list_prepend(0::BIGINT, vals), (a, x) -> a + x) AS BIGINT) AS val_sum,
       |  CAST(list_min(vals) AS BIGINT) AS val_min,
       |  CAST(list_max(vals) AS BIGINT) AS val_max,
       |  CAST(list_reduce(list_prepend(7::BIGINT,
       |    list_transform(vals, x -> CASE WHEN x < 0 THEN x + 65536 ELSE x END)),
       |    (a, x) -> (a * 131 + x) % 1000000007) AS BIGINT) AS checksum
       |FROM v""".stripMargin

  /** Arithmetic twin of [[Multimodal.transformSamples]] over the 16x8 PNG /
    * 64-sample WAV synthetic corpus: resized pixel (r, c) of the 8x4 output
    * is source pixel (2r, 2c); decimated sample i is source sample 4i —
    * pure index substitution into the deterministic value model. */
  private val multimodalTransformSql =
    s"""WITH m AS (SELECT doc_id, CAST(doc_id % 3 AS INT) AS m3 FROM documents
       |  WHERE doc_id % 3 <> 2),
       |v AS (SELECT doc_id,
       |  CASE WHEN m3 = 0 THEN 'png_resized' ELSE 'wav_decimated' END AS kind,
       |  CASE WHEN m3 = 0
       |    THEN [(doc_id * 31 + ((i // 8) * 2) * 17 + ((i % 8) * 2) * 7) % 256 for i in range(0, 32)]
       |    ELSE [(doc_id * 131 + (i * 4) * 17) % 4096 - 2048 for i in range(0, 16)]
       |  END AS vals FROM m)
       |SELECT doc_id AS media_id, kind,
       |  CAST(len(vals) AS BIGINT) AS n_values,
       |  CAST(list_reduce(list_prepend(0::BIGINT, vals), (a, x) -> a + x) AS BIGINT) AS val_sum,
       |  CAST(list_min(vals) AS BIGINT) AS val_min,
       |  CAST(list_max(vals) AS BIGINT) AS val_max,
       |  CAST(list_reduce(list_prepend(7::BIGINT,
       |    list_transform(vals, x -> CASE WHEN x < 0 THEN x + 65536 ELSE x END)),
       |    (a, x) -> (a * 131 + x) % 1000000007) AS BIGINT) AS checksum
       |FROM v""".stripMargin

  /** Mirror of [[TextOps.tokenBudgetSample]]: the oracle states the greedy
    * prefix semantics in ONE running-sum window — Spark's two-phase
    * bucket-prefix implementation must land on the identical rows. */
  private val tokenBudgetSql =
    s"""WITH t AS (SELECT doc_id, source, CAST(len($toks) AS BIGINT) AS n_tokens,
       |  ${Portable.sampleBucketDuck("doc_id")} AS bkt FROM documents),
       |c AS (SELECT doc_id, source, n_tokens,
       |  SUM(n_tokens) OVER (PARTITION BY source ORDER BY bkt, doc_id
       |    ROWS UNBOUNDED PRECEDING) AS cum_tokens FROM t)
       |SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
       |FROM c WHERE cum_tokens <= 200""".stripMargin

  /** Mirror of [[TextOps.repetitionScore]] over the same spam construction:
    * identical two-level counting, identical double divisions, identical
    * thresholds. */
  private val repetitionSql =
    s"""WITH d AS (SELECT doc_id,
       |  CASE WHEN doc_id % 7 = 0 THEN text || repeat(' spamtok', 30) ELSE text END AS text
       |FROM documents),
       |tt AS (SELECT doc_id, $toks AS toks FROM d),
       |tk AS (SELECT doc_id, toks FROM tt WHERE len(toks) > 0),
       |uc AS (SELECT doc_id, t, COUNT(*) AS tf
       |  FROM (SELECT doc_id, unnest(toks) AS t FROM tk) GROUP BY doc_id, t),
       |ua AS (SELECT doc_id, SUM(tf) AS n, COUNT(*) AS dt, MAX(tf) AS top
       |  FROM uc GROUP BY doc_id),
       |bc AS (SELECT doc_id, t, COUNT(*) AS tf
       |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
       |    i -> toks[i] || ' ' || toks[i + 1])) AS t FROM tk WHERE len(toks) > 1)
       |  GROUP BY doc_id, t),
       |ba AS (SELECT doc_id, SUM(tf) AS n, MAX(tf) AS top FROM bc GROUP BY doc_id)
       |SELECT ua.doc_id, CAST(ua.n AS BIGINT) AS n_tokens,
       |  (ua.n - ua.dt)::DOUBLE / ua.n AS dup_token_frac,
       |  ua.top::DOUBLE / ua.n AS top_token_frac,
       |  COALESCE(ba.top::DOUBLE / ba.n, 0.0) AS top_bigram_frac,
       |  (ua.top::DOUBLE / ua.n > 0.2
       |    OR COALESCE(ba.top::DOUBLE / ba.n, 0.0) > 0.18) AS is_repetitive
       |FROM ua LEFT JOIN ba ON ua.doc_id = ba.doc_id""".stripMargin

  /** Mirror of [[TextOps.shuffleShards]] (16 shards): same salted polynomial
    * shuffle key, same modulo shard, same (key, doc_id)-ordered rank. */
  private val shuffleShardsSql =
    s"""WITH h AS (SELECT doc_id, ${Portable.shuffleKeyDuck("doc_id")} AS shuffle_key
       |  FROM documents)
       |SELECT doc_id, CAST(shuffle_key % 16 AS INT) AS shard,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY shuffle_key % 16
       |    ORDER BY shuffle_key, doc_id) AS BIGINT) AS pos_in_shard
       |FROM h""".stripMargin

  private val heavyHittersSql =
    s"""WITH tok AS (SELECT doc_id, unnest($toks) AS term FROM documents)
       |SELECT term, CAST(COUNT(*) AS BIGINT) AS tf,
       |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
       |FROM tok GROUP BY term
       |ORDER BY tf DESC, term ASC LIMIT 50""".stripMargin

  /** Mirror of [[TextOps.mixtureSample]]: same sorted-CASE rate resolution,
    * same salted sampling bucket, same strict-< comparison — against the
    * same driver-rounded INTEGER thresholds (units of 1/10000), so neither
    * engine ever multiplies a rate at query time. */
  private val mixtureSampleSql = {
    def threshold(r: Double): Int = math.round(r * 10000).toInt
    val cases = MixRates.toSeq.sortBy(_._1)
      .map { case (s, r) => s"WHEN source = '$s' THEN ${threshold(r)}" }.mkString(" ")
    s"""SELECT doc_id, source FROM documents
       |WHERE ${Portable.sampleBucketDuck("doc_id")} <
       |  (CASE $cases ELSE ${threshold(MixDefault)} END)""".stripMargin
  }

  /** Mirror of [[TextOps.segmentSentences]]: generate_subscripts and unnest
    * advance in lockstep in DuckDB, giving the same 0-based sentence index
    * as Spark's posexplode; string_split_regex splits on the same
    * `[.?!]` + whitespace boundary class as Spark's split (plain character
    * classes mean Java regex and RE2 agree). */
  private val sentencesSql =
    s"""WITH d AS (SELECT doc_id,
       |  text || '. ' || substr(text, 1, 97) || '? ' || substr(text, 1, 31)
       |    || '! tail marker' AS text
       |FROM documents),
       |e AS (SELECT doc_id,
       |  generate_subscripts(string_split_regex(text, '[.?!]\\s'), 1) - 1 AS sent_idx,
       |  unnest(string_split_regex(text, '[.?!]\\s')) AS sentence FROM d)
       |SELECT doc_id, CAST(sent_idx AS INT) AS sent_idx, sentence,
       |  CAST(len(${Portable.tokensDuck("sentence")}) AS INT) AS n_tokens
       |FROM e WHERE sentence <> ''""".stripMargin

  /** Mirror of [[TextOps.dedupLines]] over the same constructed 4-line text:
    * generate_subscripts/unnest advance in lockstep (same 0-based pos as
    * posexplode), string_split on chr(10) is the same literal-newline split as
    * Spark's regex-free pattern, and string_agg ORDER BY pos rebuilds the
    * document in the same order as Spark's array_sort(collect_list(struct)). */
  private val lineDedupSql =
    s"""WITH d AS (SELECT doc_id,
       |  substr(text, 1, 40) || chr(10) || 'standard disclaimer for ' || source
       |    || chr(10) || substr(text, 41) || chr(10) || 'copyright corpus collection' AS text
       |FROM documents),
       |l AS (SELECT doc_id,
       |  generate_subscripts(string_split(text, chr(10)), 1) - 1 AS pos,
       |  unnest(string_split(text, chr(10))) AS line FROM d),
       |nz AS (SELECT * FROM l WHERE line <> ''),
       |f AS (SELECT line, COUNT(DISTINCT doc_id) AS line_df FROM nz GROUP BY line),
       |k AS (SELECT nz.doc_id, nz.pos, nz.line FROM nz JOIN f USING (line)
       |  WHERE f.line_df <= $LineMaxDf),
       |tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines FROM nz GROUP BY doc_id),
       |ka AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines_kept,
       |  string_agg(line, chr(10) ORDER BY pos) AS clean_text FROM k GROUP BY doc_id)
       |SELECT tot.doc_id, tot.n_lines,
       |  CAST(COALESCE(ka.n_lines_kept, 0) AS BIGINT) AS n_lines_kept,
       |  COALESCE(ka.clean_text, '') AS clean_text
       |FROM tot LEFT JOIN ka ON tot.doc_id = ka.doc_id""".stripMargin

  /** Mirror of [[UrlOps.domainCap]]: same constructed URL, same RE2 extraction
    * regexes (DuckDB and Spark both compile plain character-class patterns
    * identically), and a single ROW_NUMBER window — the oracle states the
    * SEMANTICS; Spark's two-phase salted top-N must equal it because the
    * (n_chars DESC, doc_id ASC) ordering is total. */
  /** Oracle twin of the domain-PageRank gate: the citation graph is replayed
    * arithmetically, then [[Graph.pageRank]]'s fixed-point integer iteration
    * is UNROLLED — one materialized CTE per round, each computing the same
    * three terms (teleport base, damped incoming floor-div contributions,
    * dangling share) in BIGINT floor arithmetic. Every pr CTE is multi-
    * referenced (dangling scalar + contribution join), hence MATERIALIZED
    * (CLAUDE.md: DuckDB re-inlines CTEs multiplicatively otherwise). DuckDB
    * SUM returns HUGEINT; it flows through intermediate rounds unchanged in
    * value (everything < 2^47) and the OUTPUT column is cast to BIGINT. */
  private val domainPageRankSql: String = {
    val S = 1000000000000L
    val head =
      s"""WITH tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM documents),
         |e AS MATERIALIZED (SELECT a.source AS src, b.source AS dst
         |  FROM documents a CROSS JOIN tot
         |  JOIN documents b ON b.doc_id = (a.doc_id * a.doc_id + 3) % tot.t
         |  WHERE a.doc_id % 20 < 17),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
         |deg AS MATERIALIZED (SELECT node, COALESCE(d, 0::BIGINT) AS deg
         |  FROM nodes LEFT JOIN (SELECT src, CAST(COUNT(*) AS BIGINT) AS d
         |    FROM e GROUP BY 1) g ON g.src = nodes.node),
         |pr0 AS MATERIALIZED (SELECT node, deg,
         |  (SELECT $S // n FROM nn) AS pr FROM deg)""".stripMargin
    val rounds = (1 to PageRankIters).map { k =>
      val p = s"pr${k - 1}"
      s""",pr$k AS MATERIALIZED (SELECT d.node, d.deg,
         |  (SELECT (($S // n) * 15) // 100 FROM nn)
         |  + (85 * (COALESCE(inc.i, 0::BIGINT)
         |           + (SELECT COALESCE(SUM(pr), 0::BIGINT) FROM $p WHERE deg = 0)
         |             // (SELECT n FROM nn))) // 100 AS pr
         |  FROM deg d
         |  LEFT JOIN (SELECT e.dst AS node, SUM(p.pr // p.deg) AS i
         |    FROM e JOIN $p p ON p.node = e.src AND p.deg > 0
         |    GROUP BY 1) inc ON inc.node = d.node)""".stripMargin
    }.mkString("\n")
    head + rounds +
      s"\nSELECT node AS domain, CAST(pr AS BIGINT) AS rank FROM pr$PageRankIters"
  }

  private val domainCapSql = {
    val blocked = BlockedDomains.map(b => s"'$b'").mkString(", ")
    s"""WITH d AS (SELECT doc_id, n_chars,
       |  'https://' || (CASE WHEN doc_id % 3 = 0 THEN 'www.' WHEN doc_id % 3 = 1 THEN 'cdn.' ELSE '' END)
       |    || source || '-example.' || (CASE WHEN doc_id % 2 = 0 THEN 'com' ELSE 'org' END)
       |    || '/docs/' || doc_id || (CASE WHEN doc_id % 5 = 0 THEN '?ref=feed' ELSE '' END) AS url
       |FROM documents),
       |p AS (SELECT doc_id, n_chars, url,
       |  lower(regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1)) AS host,
       |  regexp_extract(url, '^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)', 1) AS path
       |FROM d),
       |p2 AS (SELECT *, regexp_extract(regexp_extract(host, '^([^:]+)', 1), '([^.]+\\.[^.]+)$$', 1) AS registrable_domain FROM p),
       |f AS (SELECT * FROM p2 WHERE registrable_domain NOT IN ($blocked)),
       |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY registrable_domain
       |  ORDER BY n_chars DESC, doc_id ASC) AS domain_rank FROM f)
       |SELECT doc_id, url, host, path, registrable_domain,
       |  CAST(domain_rank AS INT) AS domain_rank
       |FROM r WHERE domain_rank <= $DomainCap""".stripMargin
  }

  private val exactSql =
    """SELECT md5(text) AS text_md5, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY md5(text)""".stripMargin

  /** Survivor set = documents minus non-keeper exact dups minus
    * non-representative near-dup component members. */
  // lazy: composes jaccardCtes/jaccardSelect, which are declared further down
  private lazy val survivorsSql =
    s"""WITH RECURSIVE $jaccardCtes,
       |pairs AS ($jaccardSelect),
       |edges AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       |comp AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS component_id
       |  FROM reach GROUP BY a),
       |near_removed AS (SELECT doc_id FROM comp WHERE doc_id <> component_id),
       |k AS (SELECT md5(text) AS k, MIN(doc_id) AS keep FROM documents GROUP BY 1),
       |exact_removed AS (SELECT d.doc_id FROM documents d
       |  JOIN k ON md5(d.text) = k.k WHERE d.doc_id <> k.keep)
       |SELECT doc_id FROM documents
       |WHERE doc_id NOT IN (SELECT doc_id FROM near_removed
       |                     UNION SELECT doc_id FROM exact_removed)""".stripMargin

  /** Oracle twin of [[Dedup.dedupSurvivorsBy]]: the union family graph
    * (exact-group star edges + exact all-pairs near-dup edges — equal to the
    * banded MinHash output under the 2e-8 miss contract `dedup_survivors`
    * already pins) closed by a recursive CTE, keepers ranked by
    * (n_chars DESC, doc_id ASC) within each family. */
  private lazy val survivorsQualitySql =
    s"""WITH RECURSIVE $jaccardCtes,
       |pairs AS ($jaccardSelect),
       |k AS (SELECT md5(text) AS k, MIN(doc_id) AS g FROM documents GROUP BY 1),
       |xe AS (SELECT d.doc_id AS doc_a, k.g AS doc_b FROM documents d
       |  JOIN k ON md5(d.text) = k.k WHERE d.doc_id <> k.g),
       |alledges AS (SELECT doc_a, doc_b FROM pairs
       |  UNION SELECT doc_a, doc_b FROM xe),
       |edges AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM alledges
       |  UNION SELECT doc_b, doc_a FROM alledges),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       |comp AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS component_id
       |  FROM reach GROUP BY a),
       |fam AS MATERIALIZED (SELECT d.doc_id, d.n_chars,
       |  COALESCE(c.component_id, d.doc_id) AS family
       |  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id),
       |r AS (SELECT family, doc_id, ROW_NUMBER() OVER (PARTITION BY family
       |  ORDER BY n_chars DESC, doc_id ASC) AS rn FROM fam)
       |SELECT f.family, k2.doc_id AS keep_doc_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_members
       |FROM fam f JOIN (SELECT family, doc_id FROM r WHERE rn = 1) k2
       |  USING (family)
       |GROUP BY 1, 2""".stripMargin

  /** Mirror of [[Dedup.incrementalDedup]] over the modulo corpus/batch split:
    * exact verdicts by md5 key membership, near-dup by exact all-pairs
    * batch × corpus Jaccard on the same distinct-shingle sets — the MinHash
    * index's verified candidates equal the exact result under the 42×3
    * band scheme's 2e-8 miss contract, so the persisted-index round trip is
    * hash-checked end to end. */
  private val incrementalSql =
    s"""WITH corpus AS (SELECT * FROM documents WHERE doc_id % 10 <> 0),
       |batch AS (SELECT * FROM documents WHERE doc_id % 10 = 0),
       |ck AS (SELECT DISTINCT md5(text) AS k FROM corpus),
       |bt AS (SELECT doc_id, $toks AS toks FROM batch),
       |ct AS (SELECT doc_id, $toks AS toks FROM corpus),
       |bs AS (SELECT doc_id, list_distinct(${Portable.shinglesDuck("toks", 3)}) AS sh FROM bt),
       |cs AS (SELECT doc_id, list_distinct(${Portable.shinglesDuck("toks", 3)}) AS sh FROM ct),
       |bs2 AS (SELECT doc_id, sh, len(sh) AS n FROM bs WHERE len(sh) > 0),
       |cs2 AS (SELECT doc_id, sh, len(sh) AS n FROM cs WHERE len(sh) > 0),
       |bshr AS (SELECT doc_id, unnest(sh) AS s FROM bs2),
       |cshr AS (SELECT doc_id, unnest(sh) AS s FROM cs2),
       |pr AS (SELECT b.doc_id AS bd, c.doc_id AS cd, COUNT(*) AS inter
       |  FROM bshr b JOIN cshr c ON b.s = c.s GROUP BY 1, 2),
       |nd AS (SELECT DISTINCT bd AS doc_id FROM pr
       |  JOIN bs2 x ON bd = x.doc_id JOIN cs2 y ON cd = y.doc_id
       |  WHERE inter::DOUBLE / (x.n + y.n - inter) >= $JaccardTau)
       |SELECT b.doc_id,
       |  CASE WHEN md5(b.text) IN (SELECT k FROM ck) THEN 'exact_dup'
       |       WHEN b.doc_id IN (SELECT doc_id FROM nd) THEN 'near_dup'
       |       ELSE 'new' END AS verdict
       |FROM batch b""".stripMargin

  /** LSH-blocked embedding near-dup pairs — full-algorithm oracle: the same
    * bucket CTEs as the ANN index, candidates from the (tbl, bucket)
    * self-join, exact cosine filter. */
  private val embLshSql =
    s"""WITH ${Portable.lshBucketsDuckCtes(16, 4)},
       |cand AS (SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
       |  FROM buckets x JOIN buckets y
       |    ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.vec_id < y.vec_id),
       |e AS (SELECT vec_id, embedding, ${Portable.normDuck("embedding")} AS nrm FROM embeddings)
       |SELECT vec_a, vec_b, cosine FROM (
       |  SELECT cand.vec_a, cand.vec_b,
       |    (${Portable.dotDuck("a.embedding", "b.embedding")}) / (a.nrm * b.nrm) AS cosine
       |  FROM cand JOIN e a ON a.vec_id = cand.vec_a JOIN e b ON b.vec_id = cand.vec_b)
       |WHERE cosine >= $CosineTau""".stripMargin

  /** Exact replica of [[Dedup.semanticDedupKeep]] (16 cells, tau =
    * CosineTau): the ann_ivf stride-centroid assignment, within-cell cosine
    * pairs, recursive-CTE transitive closure, min-reachable keep id. */
  private val semanticDedupSql =
    s"""WITH RECURSIVE st AS (SELECT GREATEST(COUNT(*) // 16, 1) AS stride FROM embeddings),
       |c AS (SELECT vec_id // stride AS cell, embedding AS emb_c FROM embeddings, st
       |  WHERE vec_id % stride = 0 AND vec_id // stride < 16),
       |v AS (SELECT vec_id, embedding AS emb_v FROM embeddings),
       |d AS (SELECT v.vec_id, c.cell,
       |    ((${Portable.dotDuck("emb_v", "emb_v")}) + (${Portable.dotDuck("emb_c", "emb_c")}))
       |      - CAST(2 AS DOUBLE) * (${Portable.dotDuck("emb_v", "emb_c")}) AS dist
       |  FROM v CROSS JOIN c),
       |rk AS (SELECT vec_id, cell,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist ASC, cell ASC) AS rn FROM d),
       |asg AS (SELECT vec_id, cell FROM rk WHERE rn = 1),
       |e AS (SELECT a0.vec_id, a0.embedding, ${Portable.normDuck("a0.embedding")} AS nrm, asg.cell
       |  FROM embeddings a0 JOIN asg ON a0.vec_id = asg.vec_id),
       |pairs AS (SELECT x.vec_id AS pa, y.vec_id AS pb FROM e x JOIN e y
       |  ON x.cell = y.cell AND x.vec_id < y.vec_id
       |  WHERE ((${Portable.dotDuck("x.embedding", "y.embedding")}) / (x.nrm * y.nrm)) >= $CosineTau),
       |edges AS MATERIALIZED (SELECT pa AS a, pb AS b FROM pairs UNION SELECT pb, pa FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e2.b FROM reach r JOIN edges e2 ON r.b = e2.a),
       |comp AS (SELECT a AS vec_id, LEAST(a, MIN(b)) AS component_id
       |  FROM reach GROUP BY a)
       |SELECT emb.vec_id, COALESCE(comp.component_id, emb.vec_id) AS keep_id
       |FROM embeddings emb LEFT JOIN comp ON emb.vec_id = comp.vec_id""".stripMargin

  /** Exact all-pairs n-gram Jaccard CTE list + final select, shared by the
    * pair queries and (under WITH RECURSIVE) the component oracle. */
  private val jaccardCtes =
    s"""docs AS (SELECT doc_id, $toks AS toks FROM documents),
       |sets AS (SELECT doc_id, list_distinct(${Portable.shinglesDuck("toks", 3)}) AS sh FROM docs),
       |sets2 AS (SELECT doc_id, sh, len(sh) AS n FROM sets WHERE len(sh) > 0),
       |shr AS (SELECT doc_id, unnest(sh) AS s FROM sets2),
       |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
       |  FROM shr a JOIN shr b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)""".stripMargin

  private val jaccardSelect =
    s"""SELECT doc_a, doc_b, jaccard FROM (
       |  SELECT doc_a, doc_b, inter::DOUBLE / (x.n + y.n - inter) AS jaccard
       |  FROM pr JOIN sets2 x ON doc_a = x.doc_id JOIN sets2 y ON doc_b = y.doc_id)
       |WHERE jaccard >= $JaccardTau""".stripMargin

  /** Exact all-pairs n-gram Jaccard — oracle for BOTH the exact explode-join
    * query and the MinHash+LSH query (whose verified candidates equal the
    * exact result; miss probability ~2e-8 per qualifying pair). */
  private val jaccardSql = s"WITH $jaccardCtes\n$jaccardSelect"

  /** Mirror of [[Dedup.editDistancePairs]]: the exact-Jaccard pair set
    * (= the verified banded candidates) re-verified by `levenshtein`.
    * DuckDB's levenshtein counts BYTES, Spark's CODEPOINTS — equal on this
    * ASCII corpus (both SFs verified: strlen(text) = length(text) on every
    * row); the operator scaladoc pins the trap. */
  private val editDistanceSql =
    s"""WITH $jaccardCtes,
       |jp AS ($jaccardSelect),
       |ed AS (SELECT jp.doc_a, jp.doc_b, jp.jaccard,
       |    CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist,
       |    greatest(length(a.text), length(b.text)) AS ml
       |  FROM jp JOIN documents a ON a.doc_id = jp.doc_a
       |          JOIN documents b ON b.doc_id = jp.doc_b)
       |SELECT doc_a, doc_b, jaccard, edit_dist,
       |  CAST(1 AS DOUBLE) - CAST(edit_dist AS DOUBLE) / ml AS edit_sim
       |FROM ed
       |WHERE CAST(1 AS DOUBLE) - CAST(edit_dist AS DOUBLE) / ml >= $EditSimTau""".stripMargin

  /** Connected components of the near-dup graph: transitive closure by
    * recursive CTE (UNION dedups paths, so it terminates), component id =
    * min reachable doc id — the declarative twin of the label-propagation
    * loop in [[Dedup.connectedComponents]]. */
  private val componentsSql =
    s"""WITH RECURSIVE $jaccardCtes,
       |pairs AS ($jaccardSelect),
       |edges AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
       |SELECT a AS doc_id, LEAST(a, MIN(b)) AS component_id
       |FROM reach GROUP BY a""".stripMargin

  private val simhashSql = {
    val s1 = (0 until Portable.SimBits)
      .map(j => s"${Portable.simBitSumDuck("h1", "w", j)} AS s1_$j").mkString(", ")
    val s2 = (0 until Portable.SimBits)
      .map(j => s"${Portable.simBitSumDuck("h2", "w", j)} AS s2_$j").mkString(", ")
    s"""WITH docs AS (SELECT doc_id, $toks AS toks FROM documents),
       |tok AS (SELECT doc_id, unnest(toks) AS t FROM docs),
       |tc AS (SELECT doc_id, t, COUNT(*)::BIGINT AS w FROM tok GROUP BY doc_id, t),
       |th AS (SELECT doc_id, w, ${Portable.phashDuck("t")} AS h1 FROM tc),
       |th2 AS (SELECT doc_id, w, h1, (h1 * ${Portable.H2A} + ${Portable.H2B}) % ${Portable.P} AS h2 FROM th),
       |sums AS (SELECT doc_id, $s1, $s2 FROM th2 GROUP BY doc_id),
       |fp AS (SELECT doc_id, ${Portable.simFingerprintDuck("s1_")} AS fp1,
       |  ${Portable.simFingerprintDuck("s2_")} AS fp2 FROM sums)
       |SELECT doc_a, doc_b, hamming FROM (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    ${Portable.hammingDuck("a.fp1", "b.fp1", "a.fp2", "b.fp2")} AS hamming
       |  FROM fp a JOIN fp b ON a.doc_id < b.doc_id)
       |WHERE hamming <= $MaxHamming""".stripMargin
  }

  private val embCosineSql =
    s"""WITH e AS (SELECT vec_id, embedding,
       |  ${Portable.normDuck("embedding")} AS nrm FROM embeddings)
       |SELECT vec_a, vec_b, cosine FROM (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    (${Portable.dotDuck("a.embedding", "b.embedding")}) / (a.nrm * b.nrm) AS cosine
       |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
       |WHERE cosine >= $CosineTau""".stripMargin

  /** Recall@k of the LSH index vs brute-force ground truth: BOTH legs are
    * the exact replicas the ann gates pin individually, composed, so the
    * recall fractions themselves hash-check (hits/k is a small-int division
    * — correctly rounded and identical in both engines). */
  private val annRecallSql =
    s"""WITH ${Portable.lshBucketsDuckCtes(16, 4)},
       |e AS (SELECT vec_id, embedding, ${Portable.normDuck("embedding")} AS nrm FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS emb_q, nrm AS norm_q FROM e WHERE vec_id < $NQueries),
       |bs AS (SELECT q.query_id, v.vec_id AS neighbor_id,
       |    (${Portable.dotDuck("emb_q", "v.embedding")}) / (norm_q * v.nrm) AS cosine
       |  FROM e v CROSS JOIN q WHERE v.vec_id <> q.query_id),
       |bt AS (SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rnk
       |    FROM bs) WHERE rnk <= $TopK),
       |qb AS (SELECT vec_id AS query_id, tbl, bucket FROM buckets WHERE vec_id < $NQueries),
       |cand AS (SELECT DISTINCT qb.query_id, b.vec_id AS neighbor_id
       |  FROM buckets b JOIN qb USING (tbl, bucket) WHERE b.vec_id <> qb.query_id),
       |ls AS (SELECT cand.query_id, cand.neighbor_id,
       |    (${Portable.dotDuck("eq.embedding", "ev.embedding")}) / (eq.nrm * ev.nrm) AS cosine
       |  FROM cand JOIN e eq ON eq.vec_id = cand.query_id JOIN e ev ON ev.vec_id = cand.neighbor_id),
       |lt AS (SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rnk
       |    FROM ls) WHERE rnk <= $TopK),
       |h AS (SELECT bt.query_id, CAST(COUNT(*) AS BIGINT) AS h
       |  FROM bt JOIN lt ON lt.query_id = bt.query_id AND lt.neighbor_id = bt.neighbor_id
       |  GROUP BY bt.query_id),
       |qs AS (SELECT DISTINCT query_id FROM bt)
       |SELECT qs.query_id, CAST(COALESCE(h.h, 0) AS BIGINT) AS hits,
       |  CAST(COALESCE(h.h, 0) AS DOUBLE) / $TopK AS recall
       |FROM qs LEFT JOIN h ON h.query_id = qs.query_id
       |ORDER BY qs.query_id""".stripMargin

  /** The JL-projected table, shared by both rp oracles: the ±1 sign-matrix
    * chains are EMBEDDED as literals from the same [[Portable.rpSigns]]
    * source the Spark projection uses — one Scala definition, two dialects,
    * zero drift. */
  private val rpProjCte =
    s"""pe AS MATERIALIZED (SELECT vec_id,
       |  ${Portable.rpProjectDuck("embedding", RpDim)} AS embedding
       |FROM embeddings)""".stripMargin

  /** Mirror of [[Similarity.bruteForceTopK]] over [[Similarity.randomProject]]:
    * exact cosine top-k in the 16-dim projected space. */
  private val rpTopkSql =
    s"""WITH $rpProjCte,
       |e AS MATERIALIZED (SELECT vec_id, embedding,
       |  ${Portable.normDuckN("embedding", RpDim)} AS nrm FROM pe),
       |q AS (SELECT vec_id AS query_id, embedding AS emb_q, nrm AS norm_q FROM e WHERE vec_id < $NQueries),
       |s AS (SELECT q.query_id, v.vec_id AS neighbor_id,
       |    (${Portable.dotDuckN("emb_q", "v.embedding", RpDim)}) / (norm_q * v.nrm) AS cosine
       |  FROM e v CROSS JOIN q WHERE v.vec_id <> q.query_id),
       |r AS (SELECT query_id, neighbor_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rnk
       |  FROM s)
       |SELECT query_id, neighbor_id, cosine, rnk FROM r WHERE rnk <= $TopK""".stripMargin

  /** Mirror of [[Similarity.rpRecall]]: full-space exact top-k (truth leg)
    * vs projected-space exact top-k (approx leg), recall@k per query —
    * the [[annRecallSql]] shape with the LSH leg swapped for the projected
    * brute-force leg. */
  private val rpRecallSql =
    s"""WITH $rpProjCte,
       |ef AS MATERIALIZED (SELECT vec_id, embedding, ${Portable.normDuck("embedding")} AS nrm FROM embeddings),
       |qf AS (SELECT vec_id AS query_id, embedding AS emb_q, nrm AS norm_q FROM ef WHERE vec_id < $NQueries),
       |fs AS (SELECT qf.query_id, v.vec_id AS neighbor_id,
       |    (${Portable.dotDuck("emb_q", "v.embedding")}) / (norm_q * v.nrm) AS cosine
       |  FROM ef v CROSS JOIN qf WHERE v.vec_id <> qf.query_id),
       |bt AS (SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rnk
       |    FROM fs) WHERE rnk <= $TopK),
       |ep AS MATERIALIZED (SELECT vec_id, embedding,
       |  ${Portable.normDuckN("embedding", RpDim)} AS nrm FROM pe),
       |qp AS (SELECT vec_id AS query_id, embedding AS emb_q, nrm AS norm_q FROM ep WHERE vec_id < $NQueries),
       |ps AS (SELECT qp.query_id, v.vec_id AS neighbor_id,
       |    (${Portable.dotDuckN("emb_q", "v.embedding", RpDim)}) / (norm_q * v.nrm) AS cosine
       |  FROM ep v CROSS JOIN qp WHERE v.vec_id <> qp.query_id),
       |pt AS (SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rnk
       |    FROM ps) WHERE rnk <= $TopK),
       |h AS (SELECT bt.query_id, CAST(COUNT(*) AS BIGINT) AS h
       |  FROM bt JOIN pt ON pt.query_id = bt.query_id AND pt.neighbor_id = bt.neighbor_id
       |  GROUP BY bt.query_id),
       |qs AS (SELECT DISTINCT query_id FROM bt)
       |SELECT qs.query_id, CAST(COALESCE(h.h, 0) AS BIGINT) AS hits,
       |  CAST(COALESCE(h.h, 0) AS DOUBLE) / $TopK AS recall
       |FROM qs LEFT JOIN h ON h.query_id = qs.query_id
       |ORDER BY qs.query_id""".stripMargin

  private val annBruteSql =
    s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding,
       |  ${Portable.normDuck("embedding")} AS nrm FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS emb_q, nrm AS norm_q FROM e WHERE vec_id < $NQueries),
       |s AS (SELECT q.query_id, v.vec_id AS neighbor_id,
       |    (${Portable.dotDuck("emb_q", "v.embedding")}) / (norm_q * v.nrm) AS cosine
       |  FROM e v CROSS JOIN q WHERE v.vec_id <> q.query_id),
       |r AS (SELECT query_id, neighbor_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rnk
       |  FROM s)
       |SELECT query_id, neighbor_id, cosine, rnk FROM r WHERE rnk <= $TopK""".stripMargin

  /** [[annBruteSql]] with the gate's pre-filter allow-set (label <> 3 AND the
    * joined document is English) applied to the NEIGHBOR side before ranking
    * — the filtered-vector-search contract stated in SQL. */
  private val annFilteredSql =
    s"""WITH allowed AS (SELECT e.vec_id FROM embeddings e
       |  JOIN documents d ON d.doc_id = e.vec_id
       |  WHERE d.lang = 'en' AND e.label <> 3),
       |e AS MATERIALIZED (SELECT vec_id, embedding,
       |  ${Portable.normDuck("embedding")} AS nrm FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS emb_q, nrm AS norm_q FROM e WHERE vec_id < $NQueries),
       |s AS (SELECT q.query_id, v.vec_id AS neighbor_id,
       |    (${Portable.dotDuck("emb_q", "v.embedding")}) / (norm_q * v.nrm) AS cosine
       |  FROM e v JOIN allowed a ON a.vec_id = v.vec_id
       |  CROSS JOIN q WHERE v.vec_id <> q.query_id),
       |r AS (SELECT query_id, neighbor_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rnk
       |  FROM s)
       |SELECT query_id, neighbor_id, cosine, rnk FROM r WHERE rnk <= $TopK""".stripMargin

  /** Replica of [[graft.operators.Retrieval.hybridRrf]]: the tfidf leg is
    * [[tfidfSql]]'s scored chain ranked 1..50, the semantic leg is the
    * brute-force cosine ranking for query vector 0, and the fusion is the
    * literal RRF arithmetic — CAST(1 AS DOUBLE) divisions (a bare 1.0 parses
    * as DECIMAL here) added in the written order, so the fused doubles
    * hash-check. */
  private val hybridRrfSql = {
    s"""WITH $tfidfScoredCtes,
       |lexall AS (SELECT doc_id, score FROM scored WHERE score > 0
       |  ORDER BY score DESC, doc_id LIMIT 50),
       |lex AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS lex_rnk FROM lexall),
       |e AS MATERIALIZED (SELECT vec_id, embedding,
       |  ${Portable.normDuck("embedding")} AS nrm FROM embeddings),
       |qv AS (SELECT vec_id AS query_id, embedding AS emb_q, nrm AS norm_q FROM e WHERE vec_id < 1),
       |ss AS (SELECT v.vec_id AS doc_id,
       |    (${Portable.dotDuck("emb_q", "v.embedding")}) / (norm_q * v.nrm) AS cosine
       |  FROM e v CROSS JOIN qv WHERE v.vec_id <> qv.query_id),
       |sem AS (SELECT doc_id, sem_rnk FROM (
       |    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS sem_rnk FROM ss)
       |  WHERE sem_rnk <= 50),
       |fused AS (SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id, lex.lex_rnk, sem.sem_rnk,
       |    COALESCE(CAST(1 AS DOUBLE) / (60 + lex.lex_rnk), CAST(0 AS DOUBLE))
       |      + COALESCE(CAST(1 AS DOUBLE) / (60 + sem.sem_rnk), CAST(0 AS DOUBLE)) AS rrf
       |  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id)
       |SELECT doc_id, lex_rnk, sem_rnk, rrf,
       |  ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS rnk
       |FROM fused ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin
  }

  /** Replica of [[graft.operators.Retrieval.hybridRrfIndexed]]: the lexical
    * leg is the BM25 chain ranked 1..50, the semantic leg the IVF replay
    * (nq = 1, 4 probes — the serve path reads the persisted index, which is
    * bitwise the from-scratch replay, exactly as `ann_ivf_index_topk`
    * already pins), and the fusion is the SAME literal RRF arithmetic as
    * [[hybridRrfSql]] — proving the fusion leg-agnostic on a full replica
    * oracle. */
  private val hybridRrfIndexSql =
    s"""WITH $bm25ScoredCtes,
       |lexall AS (SELECT doc_id, score FROM bscored ORDER BY score DESC, doc_id LIMIT 50),
       |lex AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS lex_rnk FROM lexall),
       |${ivfCtes("", "", 1)},
       |sem AS (SELECT neighbor_id AS doc_id, rnk AS sem_rnk FROM r WHERE rnk <= 50),
       |fused AS (SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id, lex.lex_rnk, sem.sem_rnk,
       |    COALESCE(CAST(1 AS DOUBLE) / (60 + lex.lex_rnk), CAST(0 AS DOUBLE))
       |      + COALESCE(CAST(1 AS DOUBLE) / (60 + sem.sem_rnk), CAST(0 AS DOUBLE)) AS rrf
       |  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id)
       |SELECT doc_id, lex_rnk, sem_rnk, rrf,
       |  ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS rnk
       |FROM fused ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin

  /** Exact replica of [[Similarity.lshAnnTopK]] (16 tables × 4 bits): bucket
    * generation, candidate equi-join, and exact cosine re-rank — every stage
    * bitwise-portable, so the "approximate" index is still hash-checkable. */
  private val annLshSql =
    s"""WITH ${Portable.lshBucketsDuckCtes(16, 4)},
       |qb AS (SELECT vec_id AS query_id, tbl, bucket FROM buckets WHERE vec_id < $NQueries),
       |cand AS (SELECT DISTINCT qb.query_id, b.vec_id AS neighbor_id
       |  FROM buckets b JOIN qb USING (tbl, bucket) WHERE b.vec_id <> qb.query_id),
       |e AS MATERIALIZED (SELECT vec_id, embedding, ${Portable.normDuck("embedding")} AS nrm FROM embeddings),
       |s AS (SELECT cand.query_id, cand.neighbor_id,
       |    (${Portable.dotDuck("q.embedding", "v.embedding")}) / (q.nrm * v.nrm) AS cosine
       |  FROM cand JOIN e q ON q.vec_id = cand.query_id JOIN e v ON v.vec_id = cand.neighbor_id),
       |r AS (SELECT query_id, neighbor_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rnk
       |  FROM s)
       |SELECT query_id, neighbor_id, cosine, rnk FROM r WHERE rnk <= $TopK""".stripMargin

  /** Exact replica of [[Similarity.ivfFlatTopK]] (16 cells, 4 probes):
    * stride-sampled centroids, squared-L2 assignment via composed dot chains,
    * probe, and exact cosine re-rank. `allowedCte`/`candJoin` optionally
    * scope the CANDIDATES to an allow-set — the filtered-serve twin
    * ([[Similarity.queryIvfIndex]] with `allowed`). */
  private def ivfSql(allowedCte: String, candJoin: String) =
    s"""WITH ${ivfCtes(allowedCte, candJoin, NQueries)}
       |SELECT query_id, neighbor_id, cosine, rnk FROM r WHERE rnk <= $TopK""".stripMargin

  /** The IVF replay's CTE chain up to the ranked `r` CTE — shared by
    * [[ivfSql]] (nq = NQueries) and [[hybridRrfIndexSql]] (nq = 1), which
    * consume different k cuts of the same ranking. */
  private def ivfCtes(allowedCte: String, candJoin: String, nq: Int) =
    s"""${allowedCte}st AS (SELECT GREATEST(COUNT(*) // 16, 1) AS stride FROM embeddings),
       |c AS (SELECT vec_id // stride AS cell, embedding AS emb_c FROM embeddings, st
       |  WHERE vec_id % stride = 0 AND vec_id // stride < 16),
       |v AS (SELECT vec_id, embedding AS emb_v FROM embeddings),
       |d AS (SELECT v.vec_id, c.cell,
       |    ((${Portable.dotDuck("emb_v", "emb_v")}) + (${Portable.dotDuck("emb_c", "emb_c")}))
       |      - CAST(2 AS DOUBLE) * (${Portable.dotDuck("emb_v", "emb_c")}) AS dist
       |  FROM v CROSS JOIN c),
       |rk AS MATERIALIZED (SELECT vec_id, cell,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist ASC, cell ASC) AS rn FROM d),
       |asg AS (SELECT vec_id, cell FROM rk WHERE rn = 1),
       |qc AS (SELECT vec_id AS query_id, cell FROM rk WHERE vec_id < $nq AND rn <= 4),
       |cand AS (SELECT DISTINCT qc.query_id, asg.vec_id AS neighbor_id
       |  FROM asg JOIN qc USING (cell)$candJoin WHERE asg.vec_id <> qc.query_id),
       |e AS MATERIALIZED (SELECT vec_id, embedding, ${Portable.normDuck("embedding")} AS nrm FROM embeddings),
       |s AS (SELECT cand.query_id, cand.neighbor_id,
       |    (${Portable.dotDuck("q.embedding", "nv.embedding")}) / (q.nrm * nv.nrm) AS cosine
       |  FROM cand JOIN e q ON q.vec_id = cand.query_id JOIN e nv ON nv.vec_id = cand.neighbor_id),
       |r AS (SELECT query_id, neighbor_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rnk
       |  FROM s)""".stripMargin

  private val annIvfSql = ivfSql("", "")

  /** The filtered-serve gate's twin: the same IVF replay with the allow-set
    * (shared with [[annFilteredSql]]) scoping the candidates. */
  private val annIvfFilteredSql = ivfSql(
    """allowed AS (SELECT e.vec_id FROM embeddings e
      |  JOIN documents d ON d.doc_id = e.vec_id
      |  WHERE d.lang = 'en' AND e.label <> 3),
      |""".stripMargin,
    " JOIN allowed al ON al.vec_id = asg.vec_id")

  /** Exact replica of [[Similarity.pqAnnTopK]] (8 subspaces x 16 stride
    * centroids): per-subspace argmin codes (ties to the lowest centroid id),
    * per-query ADC lookup table, one fixed-order addition chain for the
    * score — every float op is the same [[Portable.subL2Duck]] chain the
    * Spark side evaluates, so the compressed-domain index hash-checks. */
  private val annPqSql = {
    val m = 8; val sub = Portable.Dim / m; val ksub = 32; val refine = 100
    val d2 = (0 until m).map(mm =>
      s"${Portable.subL2Duck("v.embedding", "c.embedding", mm * sub, sub)} AS d2_$mm")
      .mkString(", ")
    val rks = (0 until m).map(mm =>
      s"ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2_$mm, j) AS r$mm").mkString(", ")
    val cds = (0 until m).map(mm => s"MAX(CASE WHEN r$mm = 1 THEN j END) AS code_$mm")
      .mkString(", ")
    val qd = (0 until m).map(mm =>
      s"${Portable.subL2Duck("q.embedding", "c.embedding", mm * sub, sub)} AS q$mm")
      .mkString(", ")
    val joins = (0 until m).map { mm =>
      if (mm == 0) s"JOIN lut l0 ON l0.j = codes.code_0"
      else s"JOIN lut l$mm ON l$mm.query_id = l0.query_id AND l$mm.j = codes.code_$mm"
    }.mkString(" ")
    val approx = (1 until m).foldLeft("l0.q0")((e, mm) => s"($e + l$mm.q$mm)")
    s"""WITH st AS (SELECT GREATEST(COUNT(*) // $ksub, 1) AS stride FROM embeddings),
       |cent AS MATERIALIZED (SELECT vec_id // stride AS j, embedding FROM embeddings, st
       |  WHERE vec_id % stride = 0 AND vec_id // stride < $ksub),
       |sc AS (SELECT v.vec_id, c.j, $d2 FROM embeddings v CROSS JOIN cent c),
       |rk AS (SELECT vec_id, j, $rks FROM sc),
       |codes AS MATERIALIZED (SELECT vec_id, $cds FROM rk GROUP BY vec_id),
       |q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < $NQueries),
       |lut AS MATERIALIZED (SELECT query_id, c.j, $qd FROM q CROSS JOIN cent c),
       |s AS (SELECT l0.query_id, codes.vec_id AS neighbor_id, $approx AS approx_dist
       |  FROM codes $joins
       |  WHERE codes.vec_id <> l0.query_id),
       |r AS (SELECT query_id, neighbor_id, approx_dist,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY approx_dist ASC, neighbor_id ASC) AS rnk
       |  FROM s),
       |short AS (SELECT query_id, neighbor_id FROM r WHERE rnk <= $refine),
       |ref AS (SELECT short.query_id, short.neighbor_id,
       |    ${Portable.subL2Duck("eq.embedding", "ev.embedding", 0, Portable.Dim)} AS l2_dist
       |  FROM short JOIN embeddings eq ON eq.vec_id = short.query_id
       |  JOIN embeddings ev ON ev.vec_id = short.neighbor_id),
       |rr AS (SELECT query_id, neighbor_id, l2_dist,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY l2_dist ASC, neighbor_id ASC) AS rnk
       |  FROM ref)
       |SELECT query_id, neighbor_id, l2_dist, rnk FROM rr WHERE rnk <= $TopK""".stripMargin
  }

  /** One unrolled Lloyd iteration of [[Clustering.kmeans]]'s DuckDB replay:
    * integer squared-L2 assignment against the previous centroid CTE (ties to
    * the lowest cell), per-(cell, dim) BIGINT sums, grid re-snap, array
    * rebuild in dim order. Pure integer arithmetic end to end — the float
    * association-order problem that makes naive k-means un-oracle-able never
    * arises. */
  private def kmeansIterCte(i: Int, prevC: String): String =
    s"""d$i AS (SELECT q.vec_id, c.cell, ${Portable.qL2Duck("q.q", "c.c")} AS dist, q.q AS q
       |  FROM q CROSS JOIN $prevC c),
       |a$i AS (SELECT vec_id, cell, q FROM (SELECT vec_id, cell, q,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist ASC, cell ASC) AS rn FROM d$i)
       |  WHERE rn = 1),
       |e$i AS (SELECT cell, ix.d AS d, q[ix.d] AS x FROM a$i, ix),
       |s$i AS (SELECT cell, d, CAST(SUM(x) AS BIGINT) AS sx, COUNT(*) AS cnt FROM e$i GROUP BY cell, d),
       |c$i AS (SELECT cell, list(${Portable.qMeanDuck("sx", "cnt")} ORDER BY d) AS c FROM s$i GROUP BY cell),""".stripMargin

  /** The Lloyd-iteration CTE chain up to the final assignment `fa` — shared
    * by the kmeans gate and the cluster-balanced sampling gate (which
    * composes temperature quotas on top of the same assignment). */
  private val kmeansCtes = {
    val iters = (1 to KmeansIters).map(i => kmeansIterCte(i, s"c${i - 1}")).mkString("\n")
    s"""q AS MATERIALIZED (SELECT vec_id, ${Portable.quantVecDuck("embedding")} AS q FROM embeddings),
       |ix AS (SELECT unnest(range(1, ${Portable.Dim + 1})) AS d),
       |st AS (SELECT GREATEST(COUNT(*) // $KmeansK, 1) AS stride FROM embeddings),
       |c0 AS (SELECT vec_id // stride AS cell, q AS c FROM q, st
       |  WHERE vec_id % stride = 0 AND vec_id // stride < $KmeansK),
       |$iters
       |fd AS (SELECT q.vec_id, c.cell, ${Portable.qL2Duck("q.q", "c.c")} AS dist
       |  FROM q CROSS JOIN c$KmeansIters c),
       |fa AS MATERIALIZED (SELECT vec_id, cell, dist FROM (SELECT vec_id, cell, dist,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist ASC, cell ASC) AS rn FROM fd)
       |  WHERE rn = 1)""".stripMargin
  }

  private val kmeansSql =
    s"""WITH $kmeansCtes,
       |sz AS (SELECT cell, COUNT(*) AS cluster_size FROM fa GROUP BY cell)
       |SELECT fa.vec_id, fa.cell AS cluster, fa.dist, sz.cluster_size
       |FROM fa JOIN sz USING (cell)""".stripMargin

  /** Oracle twin of [[Clustering.prototypePrune]] over the same Lloyd
    * assignment chain: total-order window (dist ASC, vec_id ASC) per cell,
    * keep rank > size * dropNum // dropDen. */
  private val prototypePruneSql =
    s"""WITH $kmeansCtes,
       |sz AS (SELECT cell, COUNT(*) AS cluster_size FROM fa GROUP BY cell),
       |r AS (SELECT fa.vec_id, fa.cell, fa.dist, sz.cluster_size,
       |  ROW_NUMBER() OVER (PARTITION BY fa.cell
       |    ORDER BY fa.dist ASC, fa.vec_id ASC) AS rn
       |  FROM fa JOIN sz USING (cell))
       |SELECT vec_id AS doc_id, cell AS cluster, dist
       |FROM r WHERE rn > cluster_size * 1 // 4""".stripMargin

  /** Exact replica of the cluster-balanced sampling composition: the SAME
    * Lloyd assignment chain, then temperature quotas (isqrt weights, exact
    * integer arithmetic) over CLUSTER ids instead of source domains —
    * [[graft.operators.TextOps.temperatureSample]]'s oracle with dom =
    * assigned cell. */
  private val clusterSampleSql =
    s"""WITH $kmeansCtes,
       |ts AS (SELECT vec_id AS doc_id, cell AS dom,
       |  ${Portable.sampleBucketDuck("vec_id")} AS bkt,
       |  ${Portable.tempKeyDuck("vec_id")} AS tk FROM fa),
       |tcc AS (SELECT dom, CAST(COUNT(*) AS BIGINT) AS c FROM ts GROUP BY dom),
       |tww AS (SELECT dom, ${Portable.isqrtDuck("c")} AS w FROM tcc),
       |ttot AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM tww),
       |tq AS (SELECT dom, CAST(($TempTargetDocs * w) // tw AS BIGINT) AS quota
       |  FROM tww CROSS JOIN ttot),
       |tr AS (SELECT doc_id, dom,
       |  CAST(row_number() OVER (PARTITION BY dom ORDER BY bkt, tk, doc_id) AS BIGINT) AS dom_rank
       |  FROM ts)
       |SELECT tr.doc_id, tr.dom AS cluster, tr.dom_rank, tq.quota
       |FROM tr JOIN tq USING (dom) WHERE tr.dom_rank <= tq.quota""".stripMargin

  /** Exact replica of [[Similarity.sq8AnnTopK]]: per-dim min/max train, the
    * 256-level affine snap, pure-integer approximate distances over the code
    * arrays, exact L2 refinement of the shortlist. */
  private val annSq8Sql = {
    val refine = 100
    s"""WITH st AS (SELECT ${Portable.sq8StatsDuck("embedding").mkString(", ")} FROM embeddings),
       |c AS MATERIALIZED (SELECT vec_id, ${Portable.sq8VecDuck("embedding")} AS c FROM embeddings, st),
       |q AS (SELECT vec_id AS query_id, c AS cq FROM c WHERE vec_id < $NQueries),
       |s AS (SELECT q.query_id, v.vec_id AS neighbor_id,
       |    ${Portable.qL2Duck("q.cq", "v.c")} AS approx_dist
       |  FROM c v CROSS JOIN q WHERE v.vec_id <> q.query_id),
       |r AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY approx_dist ASC, neighbor_id ASC) AS rnk
       |  FROM s) WHERE rnk <= $refine),
       |ref AS (SELECT r.query_id, r.neighbor_id,
       |    ${Portable.subL2Duck("eq.embedding", "ev.embedding", 0, Portable.Dim)} AS l2_dist
       |  FROM r JOIN embeddings eq ON eq.vec_id = r.query_id
       |  JOIN embeddings ev ON ev.vec_id = r.neighbor_id),
       |rr AS (SELECT query_id, neighbor_id, l2_dist,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY l2_dist ASC, neighbor_id ASC) AS rnk
       |  FROM ref)
       |SELECT query_id, neighbor_id, l2_dist, rnk FROM rr WHERE rnk <= $TopK""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "text_bpe_segment"       -> bpeSegmentSql,
    "text_wordpiece"         -> wordpieceSql,
    "text_unigram_segment"   -> unigramSegmentSql,
    "text_gopher_rules"      -> gopherRulesSql,
    "text_c4_clean"          -> c4CleanSql,
    "embed_kmeans"           -> kmeansSql,
    "embed_prototype_prune"  -> prototypePruneSql,
    "embed_cluster_sample"   -> clusterSampleSql,
    "ann_sq8_topk"           -> annSq8Sql,
    "ann_pq_topk"            -> annPqSql,
    // the persisted-index round trip must return the SAME result as the
    // in-memory pipeline — one oracle pins both
    "ann_pq_index_topk"      -> annPqSql,
    "ann_lsh_topk"           -> annLshSql,
    "ann_ivf_topk"           -> annIvfSql,
    // same principle: served-from-lake IVF/LSH must equal the in-memory pipelines
    "ann_ivf_index_topk"     -> annIvfSql,
    "ann_lsh_index_topk"     -> annLshSql,
    "text_token_stats"       -> tokenStatsSql,
    "text_language_id"       -> languageIdSql,
    "text_quality_score"     -> qualityScoreSql,
    "text_corpus_stats"      -> corpusStatsSql,
    "text_train_split"       -> trainSplitSql,
    "text_train_split_by"    -> trainSplitBySql,
    "text_quality_filter"    -> qualityFilterSql,
    "text_quality_filter_domain" -> qualityFilterDomainSql,
    "text_contamination"     -> contaminationSql,
    "text_contamination_fuzzy" -> contaminationFuzzySql,
    "text_contamination_serve" -> contaminationFuzzySql,
    "text_bm25_search"       -> bm25Sql,
    "text_tfidf_search"      -> tfidfSql,
    "text_pack_sequences"    -> packSequencesSql,
    "text_bestfit_pack"      -> bestFitPackSql,
    "text_bestfit_waste"     -> bestFitWasteSql,
    "text_heavy_hitters"     -> heavyHittersSql,
    "text_mixture_sample"    -> mixtureSampleSql,
    "text_repetition"        -> repetitionSql,
    "text_token_budget"      -> tokenBudgetSql,
    "text_sentences"         -> sentencesSql,
    "multimodal_meta"        -> multimodalMetaSql,
    "multimodal_pixels"      -> multimodalPixelsSql,
    "multimodal_transform"   -> multimodalTransformSql,
    "multimodal_near_dup"    -> multimodalNearDupSql,
    "multimodal_audio_near_dup" -> multimodalAudioNearDupSql,
    "dedup_exact"            -> exactSql,
    "dedup_ngram_jaccard"    -> jaccardSql,
    "dedup_components"       -> componentsSql,
    // star contraction shares the min-label output contract — same oracle
    "dedup_components_stars" -> componentsSql,
    "dedup_survivors"        -> survivorsSql,
    "dedup_survivors_quality" -> survivorsQualitySql,
    "dedup_embedding_lsh"    -> embLshSql,
    "dedup_minhash_lsh"      -> jaccardSql,
    "dedup_edit_distance"    -> editDistanceSql,
    "text_domain_mixture"    -> domainMixtureSql,
    "text_mixture_learned"   -> mixtureLearnedSql,
    "retrieval_hard_negatives" -> hardNegativesSql,
    "dedup_simhash"          -> simhashSql,
    "dedup_embedding_cosine" -> embCosineSql,
    "dedup_semantic"         -> semanticDedupSql,
    "dedup_incremental"      -> incrementalSql,
    "dedup_substr_excise"    -> substrExciseSql,
    "text_curation"          -> curationSql,
    "text_curation_families" -> curationFamiliesSql,
    "text_shard_provenance"  -> shardProvenanceSql,
    "text_curation_e2e"      -> curationE2ESql,
    "text_shuffle_shards"    -> shuffleShardsSql,
    "text_line_dedup"        -> lineDedupSql,
    "text_domain_cap"        -> domainCapSql,
    "text_domain_pagerank"   -> domainPageRankSql,
    "text_unigram_surprisal" -> unigramSurprisalSql,
    "dedup_cdc_chunks" -> cdcChunksSql,
    "text_bigram_surprisal" -> bigramSurprisalSql,
    "text_trigram_surprisal" -> trigramSurprisalSql,
    "text_chunk_windows" -> chunkWindowsSql,
    "text_temperature_sample" -> temperatureSampleSql,
    "text_dsir_sample"       -> dsirSql,
    "ann_recall_eval"        -> annRecallSql,
    "ann_brute_force_topk"   -> annBruteSql,
    "embed_rp_topk"          -> rpTopkSql,
    "embed_rp_recall"        -> rpRecallSql,
    "ann_filtered_topk"      -> annFilteredSql,
    "ann_ivf_filtered_topk"  -> annIvfFilteredSql,
    "retrieval_hybrid_rrf"   -> hybridRrfSql,
    "retrieval_hybrid_rrf_index" -> hybridRrfIndexSql,
    "text_quality_classifier" -> qualityClassifierSql,
    "text_quality_classifier_serve" -> qualityClassifierServeSql)
}
