"""Registry of pipeline operators: name -> (runner, oracle SQL | None).

Runner signature matches the driver contract: (spark, sf_dir) -> DataFrame.
"""

from __future__ import annotations

from .. import skew, sources, streaming
from . import clustering, corpus, dedup, multimodal, similarity, temporal, text

PIPELINE_OPS: dict[str, tuple] = {
    # text analysis
    "text_token_count": (text.token_count, text.token_count_oracle()),
    "text_language_id": (text.language_id, text.language_id_oracle()),
    "text_quality_score": (text.quality_score, text.quality_score_oracle()),
    "text_bigram_topk": (text.bigram_topk, text.bigram_topk_oracle()),
    "text_fingerprint": (text.fingerprint, text.fingerprint_oracle()),
    "text_lang_confusion": (text.lang_confusion, text.lang_confusion_oracle()),
    # dedup
    "dedup_exact": (dedup.exact_dedup, dedup.exact_dedup_oracle()),
    "dedup_minhash_lsh": (dedup.minhash_lsh_pairs, dedup.minhash_lsh_oracle()),
    "dedup_ngram_jaccard": (
        dedup.ngram_jaccard_pairs,
        dedup.ngram_jaccard_oracle(),
    ),
    "dedup_simhash": (dedup.simhash_pairs, dedup.simhash_oracle()),
    # r9: exact Levenshtein verify over the shared LSH candidates --
    # the quadratic DP paid per candidate, never per pair
    "dedup_edit_distance": (
        dedup.edit_distance_pairs,
        dedup.edit_distance_oracle(),
    ),
    "dedup_embedding_cosine": (
        dedup.embedding_cosine_pairs,
        dedup.embedding_cosine_oracle(),
    ),
    # r11 (VERDICT r10 #4): a new batch deduped against the STORED
    # partitioned band index -- corpus signatures never recomputed,
    # non-probed shards never read (PartitionFilter enforced by raise)
    "dedup_incremental": (
        dedup.incremental_minhash_pairs,
        dedup.incremental_minhash_oracle(),
    ),
    # r11: the write half of the ingest loop -- accepted batch docs
    # committed into the stored index via dynamic partition overwrite
    # (only the batch's shards rewritten; untouched dirs byte-identical,
    # pytest-asserted); oracle rebuilds the post-commit index from raw
    "dedup_index_commit": (
        dedup.index_commit_stats,
        dedup.index_commit_oracle(),
    ),
    # r12 (VERDICT r11 #2): TWO consecutive batches through one stored
    # index -- batch1 probe -> accept -> commit, then batch2 probes the
    # grown index; batch2's answer must include pairs against ACCEPTED
    # batch1 docs and exclude pairs against REJECTED ones.  Oracle
    # recomputes the whole two-day loop from raw text.
    "dedup_multibatch": (
        dedup.multibatch_ingest_pairs,
        dedup.multibatch_oracle(),
    ),
    "dedup_semdedup": (dedup.semdedup, dedup.semdedup_oracle()),
    # r12: exact duplicate-span detection (Lee et al. 2022 substring
    # dedup at K-gram granularity): per-doc duplicated-span fraction,
    # one gram-count shuffle + co-partitioned join back
    "dedup_substring": (
        dedup.substring_dup_spans,
        dedup.substring_dup_spans_oracle(),
    ),
    # r13: the removal twin -- excise every token covered by a
    # duplicated K-gram and emit per-doc span/kept/removed counts plus
    # the cleaned text's md5, the diagnostic turned curation action
    "dedup_substring_removal": (
        dedup.substring_removal,
        dedup.substring_removal_oracle(),
    ),
    "dedup_clusters": (
        clustering.duplicate_clusters,
        clustering.duplicate_clusters_oracle(),
    ),
    # similarity search
    "sim_bruteforce_topk": (
        similarity.brute_force_topk,
        similarity.brute_force_topk_oracle(),
    ),
    "sim_lsh_ann_topk": (
        similarity.lsh_ann_topk,
        similarity.lsh_ann_topk_oracle(),
    ),
    "sim_ivf_topk": (
        similarity.ivf_topk,
        similarity.ivf_topk_oracle(),
    ),
    "sim_hamming_topk": (
        similarity.hamming_topk,
        similarity.hamming_topk_oracle(),
    ),
    "sim_pq_adc_topk": (
        similarity.pq_adc_topk,
        similarity.pq_adc_topk_oracle(),
    ),
    "sim_ivfpq_topk": (
        similarity.ivfpq_topk,
        similarity.ivfpq_topk_oracle(),
    ),
    # r10: codebook TRAINING -- PQ_M independent per-subspace k-means
    # (integer-exact Lloyd, floor-division updates), completing the PQ
    # family: train -> encode -> search
    "emb_pq_train": (
        similarity.pq_train,
        similarity.pq_train_oracle(),
    ),
    # r10: FAISS's actual default -- residual encoding (by_residual=
    # true): codes are offsets from the owning list's centroid, ADC via
    # per-(query, list) precomputed tables; all integer-exact, oracle
    # fully relational
    "sim_ivfpq_residual": (
        similarity.ivfpq_residual_topk,
        similarity.ivfpq_residual_topk_oracle(),
    ),
    # r10: the partition-pruned list layout ivfpq_topk's docstring
    # promises -- lists written partitionBy(cent_id), probed with a
    # partition filter so non-probed lists are never read (scan
    # metrics asserted in tests/test_plan_shape.py)
    "sim_ivfpq_pruned": (
        similarity.ivfpq_pruned_topk,
        similarity.ivfpq_pruned_topk_oracle(),
    ),
    "emb_quantize_int8": (
        similarity.quantize_int8,
        similarity.quantize_int8_oracle(),
    ),
    # multimodal plumbing (mapInPandas path)
    "mm_binary_stats": (
        multimodal.binary_stats,
        multimodal.binary_stats_oracle(),
    ),
    "mm_frame_sample": (
        multimodal.frame_sample,
        multimodal.frame_sample_oracle(),
    ),
    # r9: overlapping PCM framing with integer frame features (energy,
    # zero crossings, peak) -- the audio analog of frame_sample
    "mm_audio_framing": (
        multimodal.audio_framing,
        multimodal.audio_framing_oracle(),
    ),
    "mm_image_decode": (
        multimodal.image_decode_demo,
        multimodal.image_decode_demo_oracle(),
    ),
    # temporal (batch)
    "evt_hourly_rollup": (temporal.hourly_rollup, temporal.hourly_rollup_oracle()),
    "evt_sessionize": (temporal.sessionize, temporal.sessionize_oracle()),
    "evt_asof_join": (temporal.asof_join, temporal.asof_join_oracle()),
    "evt_funnel": (temporal.funnel, temporal.funnel_oracle()),
    "evt_range_join": (temporal.range_join, temporal.range_join_oracle()),
    "evt_scd2_intervals": (
        temporal.scd2_intervals,
        temporal.scd2_intervals_oracle(),
    ),
    # r9: incremental materialized-rollup maintenance (merge stored
    # partials with one day's delta; gate proves == full recompute)
    "evt_incremental_rollup": (
        temporal.incremental_rollup,
        temporal.incremental_rollup_oracle(),
    ),
    "evt_asof_tolerance": (
        temporal.asof_join_tolerance,
        temporal.asof_join_tolerance_oracle(),
    ),
    # structured streaming (availableNow -> memory sink)
    "stream_hourly_counts": (
        streaming.hourly_counts_stream,
        streaming.hourly_counts_stream_oracle(),
    ),
    "stream_sessionize": (
        streaming.sessionize_stream,
        streaming.sessionize_stream_oracle(),
    ),
    "stream_dedup": (streaming.dedup_stream, streaming.dedup_stream_oracle()),
    "stream_enrich": (streaming.enrich_stream, streaming.enrich_stream_oracle()),
    "stream_sliding_counts": (
        streaming.sliding_counts_stream,
        streaming.sliding_counts_stream_oracle(),
    ),
    "stream_join": (streaming.join_stream, streaming.join_stream_oracle()),
    # r10: streaming bounded-state quantile sketch -- one <=41-slot
    # count vector per event_type as applyInPandasWithState state,
    # bucket index JVM-side, CDF walk batch-side (mirrors the HLL's
    # gate-proved division of labor)
    "stream_quantile_sketch": (
        streaming.quantile_sketch_stream,
        streaming.quantile_sketch_stream_oracle(),
    ),
    "stream_hll_users": (
        streaming.hll_users_stream,
        streaming.hll_users_stream_oracle(),
    ),
    # r11: the streaming leg of the incremental-ingest dedup loop --
    # arriving docs probe the STORED band index via a stateless
    # stream-static join; same answer (and oracle) as the batch probe
    "stream_incremental_dedup": (
        streaming.incremental_dedup_stream,
        streaming.incremental_dedup_stream_oracle(),
    ),
    "stream_feedback_join": (
        streaming.feedback_broadcast_join,
        streaming.feedback_broadcast_join_oracle(),
    ),
    # source/sink formats (JSONL interchange round-trip)
    "io_jsonl_roundtrip": (
        sources.jsonl_roundtrip,
        sources.jsonl_roundtrip_oracle(),
    ),
    "io_csv_roundtrip": (
        sources.csv_roundtrip,
        sources.csv_roundtrip_oracle(),
    ),
    # r6: hive-partitioned sink + pruned read (PartitionFilters)
    "io_bucketed_join": (
        sources.bucketed_join_gate,
        sources.bucketed_join_gate_oracle(),
    ),
    "io_zorder_skipping": (
        sources.zorder_skipping,
        sources.zorder_skipping_oracle(),
    ),
    "io_runtime_bloom_prune": (
        sources.runtime_bloom_prune,
        sources.runtime_bloom_prune_oracle(),
    ),
    # r9: copy-on-write MERGE upsert + small-file compaction (table
    # maintenance patterns)
    "io_merge_upsert": (
        sources.merge_upsert,
        sources.merge_upsert_oracle(),
    ),
    "io_compact_small_files": (
        sources.compact_small_files,
        sources.compact_small_files_oracle(),
    ),
    "io_partitioned_roundtrip": (
        sources.partitioned_roundtrip,
        sources.partitioned_roundtrip_oracle(),
    ),
    # skew-aware execution (salted join; result-invariant vs plain SQL)
    "skew_salted_join": (skew.skew_demo, skew.skew_demo_oracle()),
    # r12: the OTHER skew remedy -- hot-key isolation: hot slice joins
    # a broadcast of just the hot keys' dim rows (no shuffle), cold
    # slice takes the now-skew-free shuffle join; union == plain join
    "skew_hotkey_hybrid": (
        skew.hotkey_hybrid_join,
        skew.hotkey_hybrid_join_oracle(),
    ),
    # corpus preparation
    "corpus_clean": (corpus.clean_text, corpus.clean_text_oracle()),
    "corpus_redact_pii": (corpus.redact_pii, corpus.redact_pii_oracle()),
    "corpus_vocab_topk": (corpus.vocabulary_topk, corpus.vocabulary_topk_oracle()),
    "corpus_tfidf_topk": (corpus.tfidf_topk, corpus.tfidf_topk_oracle()),
    "corpus_dataset_split": (corpus.dataset_split, corpus.dataset_split_oracle()),
    "corpus_decontaminate": (corpus.decontaminate, corpus.decontaminate_oracle()),
    # r9: the approximate scale path -- an 8 KB broadcast Bloom filter
    # instead of shipping the eval shingle set; no false negatives by
    # construction, exact count rides along to show the FP rate
    "corpus_decontaminate_bloom": (
        corpus.decontaminate_bloom,
        corpus.decontaminate_bloom_oracle(),
    ),
    "corpus_sample_stratified": (
        corpus.sample_stratified,
        corpus.sample_stratified_oracle(),
    ),
    # r10: the end-to-end curation run -- exact dedup -> LSH near-dup
    # -> decontamination -> quality gate composed as ONE lazy plan,
    # per-stage doc/token survival funnel as the output (the oracle
    # recomputes every stage independently, 5 scans)
    "corpus_train_pipeline": (
        corpus.train_pipeline,
        corpus.train_pipeline_oracle(),
    ),
    "corpus_curate": (corpus.curate, corpus.curate_oracle()),
    # round-4 additions: repetition quality signals, sequence packing,
    # filter funnel report, cohort retention
    "text_repetition_stats": (
        text.repetition_stats,
        text.repetition_stats_oracle(),
    ),
    "corpus_pack_sequences": (
        corpus.pack_sequences,
        corpus.pack_sequences_oracle(),
    ),
    "corpus_filter_funnel": (
        corpus.filter_funnel,
        corpus.filter_funnel_oracle(),
    ),
    "evt_retention_cohorts": (
        temporal.retention_cohorts,
        temporal.retention_cohorts_oracle(),
    ),
    "corpus_chunk_overlap": (
        corpus.chunk_overlap,
        corpus.chunk_overlap_oracle(),
    ),
    "evt_anomaly_hours": (
        temporal.anomaly_hours,
        temporal.anomaly_hours_oracle(),
    ),
    "corpus_score_model": (
        corpus.score_quality_model,
        corpus.score_quality_model_oracle(),
    ),
    "stream_sink_parquet": (
        streaming.sink_parquet_stream,
        streaming.sink_parquet_stream_oracle(),
    ),
    "dedup_containment": (
        dedup.containment_pairs,
        dedup.containment_oracle(),
    ),
    "evt_hourly_topk": (
        temporal.hourly_topk_users,
        temporal.hourly_topk_users_oracle(),
    ),
    "text_oov_bigram_rate": (
        text.oov_bigram_rate,
        text.oov_bigram_rate_oracle(),
    ),
    # new r5: data-mixing, shuffled sharding, frequency-weighted diversity
    "corpus_mix_weighted": (
        corpus.mix_weighted,
        corpus.mix_weighted_oracle(),
    ),
    "corpus_shuffle_shard": (
        corpus.shuffle_shard,
        corpus.shuffle_shard_oracle(),
    ),
    "text_token_diversity": (
        text.token_diversity,
        text.token_diversity_oracle(),
    ),
    "corpus_boilerplate": (
        corpus.boilerplate_shingles,
        corpus.boilerplate_shingles_oracle(),
    ),
    "evt_transition_matrix": (
        temporal.transition_matrix,
        temporal.transition_matrix_oracle(),
    ),
    "emb_norm_stats": (
        similarity.norm_stats,
        similarity.norm_stats_oracle(),
    ),
    "mm_shard_manifest": (
        multimodal.shard_manifest,
        multimodal.shard_manifest_oracle(),
    ),
    # new r6: survivor selection (clusters -> deduplicated corpus) and
    # the one-pass embedding Gram matrix (PCA/whitening statistic)
    "dedup_survivors": (
        clustering.cluster_survivors,
        clustering.cluster_survivors_oracle(),
    ),
    "emb_gram_matrix": (
        similarity.gram_matrix,
        similarity.gram_matrix_oracle(),
    ),
    # r6: distributed integer-exact Lloyd's k-means (coarse quantizer /
    # semantic-blocking trainer); oracle unrolls the same rounds in SQL
    "emb_kmeans": (
        similarity.kmeans,
        similarity.kmeans_oracle(),
    ),
    # r6: BPE-trainer pair statistic, per-user featurization, and the
    # per-source data card
    "text_bpe_pair_topk": (
        text.bpe_pair_topk,
        text.bpe_pair_topk_oracle(),
    ),
    "evt_user_features": (
        temporal.user_features,
        temporal.user_features_oracle(),
    ),
    "corpus_source_stats": (
        corpus.source_stats,
        corpus.source_stats_oracle(),
    ),
    # r6: in-pipeline bigram-LM document scoring (CCNet-style filter)
    "text_bigram_lm_score": (
        text.bigram_lm_score,
        text.bigram_lm_score_oracle(),
    ),
    # r6: power-iteration PCA projection (integer-exact, no MLlib)
    "emb_pca_project": (
        similarity.pca_project,
        similarity.pca_project_oracle(),
    ),
    # r6: streaming as-of join (stateful carry-forward; Spark has no
    # native streaming as-of) -- same DuckDB ASOF JOIN oracle as batch
    "stream_asof_join": (
        streaming.asof_stream,
        streaming.asof_stream_oracle(),
    ),
    # r6: exact quantiles over the bounded cent domain (histogram walk,
    # never a per-group sort/collect)
    "evt_value_quantiles": (
        temporal.value_quantiles,
        temporal.value_quantiles_oracle(),
    ),
    # r10: gap sessions via the BUILT-IN session_window operator (one
    # merged-session aggregation, no window pass; streaming-ready) --
    # the idiomatic twin of evt_sessionize, boundary semantics per spec
    "evt_session_window_native": (
        temporal.session_window_native,
        temporal.session_window_native_oracle(),
    ),
    # r10: the sketch's rollup proof -- full-range quantiles computed
    # ONLY from stored per-day histograms (count addition), oracle
    # recomputes both scopes from raw values (VERDICT r9 #4)
    "evt_quantile_rollup": (
        temporal.quantile_rollup,
        temporal.quantile_rollup_oracle(),
    ),
    # r9: the bounded-state variant -- <= QSK_BITS power-of-two buckets
    # per key (320 B of mergeable state), est <= 2x exact by
    # construction, ratio columns measure the bound
    "evt_quantile_sketch": (
        temporal.quantile_sketch,
        temporal.quantile_sketch_oracle(),
    ),
    # r6: winnowing fingerprint selection (MOSS) -- pure projection
    "text_winnow_fingerprints": (
        text.winnow_fingerprints,
        text.winnow_fingerprints_oracle(),
    ),
    # r7: count-min sketch frequency estimation vs exact counts
    "text_countmin_freq": (text.countmin_freq, text.countmin_freq_oracle()),
    "text_hll_vocab": (text.hll_vocab, text.hll_vocab_oracle()),
    "text_hll_rollup": (text.hll_rollup, text.hll_rollup_oracle()),
    # r12: KMV (theta) set sketch -- the sketch family's set-operation
    # leg: pairwise source vocabulary overlap estimated on K-int
    # sketches (merge -> K smallest -> in-both count / K), exact
    # jaccard riding along as ground truth
    "text_kmv_overlap": (
        text.kmv_source_overlap,
        text.kmv_source_overlap_oracle(),
    ),
    # r12: the KMV mergeability proof -- per-(source, lang) sub-
    # sketches merged per source; the merged sketch is provably
    # identical to the direct build, so this op SHARES the direct op's
    # oracle and gate agreement is the proof (the hll_rollup pattern)
    "text_kmv_rollup": (
        text.kmv_rollup,
        text.kmv_source_overlap_oracle(),
    ),
    # r12: the KMV family's streaming leg -- per-source K-minimum state
    # (K int64s forever) merged per micro-batch, distinct count read
    # out via the theta estimator; oracle recomputes the sketch from
    # raw text relationally
    "stream_kmv_distinct": (
        streaming.kmv_distinct_stream,
        streaming.kmv_distinct_stream_oracle(),
    ),
    # r6: dedup-detector cross-validation report
    "dedup_family_agreement": (
        dedup.family_agreement,
        dedup.family_agreement_oracle(),
    ),
    # r6: per-source vocabulary growth (Heaps'-law readout)
    "text_heaps_law": (
        text.heaps_law,
        text.heaps_law_oracle(),
    ),
    # r6: ANN acceptance report (recall@k of LSH/IVF vs brute force)
    "sim_recall_report": (
        similarity.recall_report,
        similarity.recall_report_oracle(),
    ),
    # r6: stationary distribution of the behavior transition chain
    "evt_markov_stationary": (
        temporal.markov_stationary,
        temporal.markov_stationary_oracle(),
    ),
    # r6: the one-row release dataset card
    "corpus_dataset_card": (
        corpus.dataset_card,
        corpus.dataset_card_oracle(),
    ),
    # r12: hypertable-style hourly gap-fill + LOCF per event_type;
    # oracle implements the carry-forward via DuckDB's native ASOF
    # LEFT JOIN, cross-validating the semantics
    "evt_gapfill_locf": (
        temporal.gapfill_locf,
        temporal.gapfill_locf_oracle(),
    ),
    # r12: FAISS range_search parity -- every neighbor with cosine >=
    # RANGE_TAU (data-dependent output cardinality, the exact baseline
    # for the IVF-pruned scale path), per-query hit count riding along
    "sim_range_search": (
        similarity.range_search,
        similarity.range_search_oracle(),
    ),
    # r12: ClickHouse windowFunnel parity -- max funnel level whose
    # WHOLE chain fits one window, max over every anchor view (greedy
    # first-match funnels can miss chains a later anchor completes)
    "evt_window_funnel": (
        temporal.window_funnel,
        temporal.window_funnel_oracle(),
    ),
    # r12: Okapi BM25 ranked retrieval over fixed keyword queries --
    # transcendental-free (rational RSJ idf, integer micro-score sums)
    # so both engines agree bit-exactly; broadcast term-prune first
    "text_bm25_topk": (
        text.bm25_topk,
        text.bm25_topk_oracle(),
    ),
    # r12: generational parquet read across a schema change
    # (mergeSchema): pre-evolution files null exactly the added column,
    # gen=N dirs stay partition-prunable; oracle recomputes from the
    # original table with the same cutoff
    "io_schema_evolution": (
        sources.schema_evolution,
        sources.schema_evolution_oracle(),
    ),
    # r13: manifest snapshots + time travel (Iceberg-lite): immutable
    # data files + per-commit JSON manifests; append = manifest swap,
    # delete = copy-on-write of only the affected files (located via
    # input_file_name), AS-OF reads reproduce every version from its
    # manifest's exact file list; oracle recomputes each version from
    # raw with the version predicates
    "io_snapshot_time_travel": (
        sources.snapshot_time_travel,
        sources.snapshot_time_travel_oracle(),
    ),
    # r14: CDC / incremental read between snapshot versions from the
    # manifests' file-set difference alone -- appended files scanned as
    # inserts, COW-rewritten files anti-joined old-minus-new as deletes
    # (new-minus-old raise-enforced empty); oracle recomputes both
    # deltas from raw with the same split / rank-bound predicates
    "io_snapshot_changes": (
        sources.snapshot_changes,
        sources.snapshot_changes_oracle(),
    ),
    # r14: snapshot expiry + vacuum -- retain only the latest version,
    # drop older manifests, unlink every data file unreachable from a
    # retained manifest (exactly the COW-superseded files);
    # raise-enforces no retained manifest references a deleted file;
    # the retained version must still answer its from-raw oracle
    "io_snapshot_expiry": (
        sources.snapshot_expiry,
        sources.snapshot_expiry_oracle(),
    ),
    # r14: snapshot branching -- a branch is another manifest chain
    # forking at v2, applying its OWN COW delete into its OWN
    # directory; main's manifests byte-unchanged (raise-enforced);
    # base/main/branch each read from their manifest's exact files
    "io_snapshot_branch": (
        sources.snapshot_branch,
        sources.snapshot_branch_oracle(),
    ),
    # r15: branch MERGE + fast-forward -- closes the git-for-data loop
    # (VERDICT r14 missing #1): a tail-rank branch2 forks at v2; the
    # 3-way merge = main's chain + branch2's private rewrites, raising
    # SnapshotMergeConflict when both refs rewrote the same ancestor
    # (pytest-driven); merging into the unadvanced fork point
    # fast-forwards to branch2's head, raise-enforced.  Pure manifest
    # set arithmetic: the merge reads/writes ZERO data files
    "io_snapshot_merge": (
        sources.snapshot_merge,
        sources.snapshot_merge_oracle(),
    ),
    # r12: incremental ANN ingest -- the IVF twin of the dedup ingest
    # loop: base index built WITHOUT the batch, batch encoded under the
    # frozen model and dynamic-partition-overwritten into ONLY its
    # lists; the grown index must answer exactly like single-shot
    # IVFADC over everything (shares ivfpq_topk's oracle)
    "sim_ivf_append": (
        similarity.ivf_append_topk,
        similarity.ivf_append_topk_oracle(),
    ),
    # r13: the TWO-DAY leg of the IVF ingest loop (the
    # dedup_multibatch twin): day 2 appends onto the index day 1 grew
    # and must carry day 1's vectors through its co-touched-list
    # rewrites; still shares the single-shot IVFADC oracle
    "sim_ivf_multibatch": (
        similarity.ivf_multibatch_topk,
        similarity.ivf_multibatch_topk_oracle(),
    ),
    # r13: the delete half of the ANN lifecycle (FAISS remove_ids):
    # doomed rows located model-side (frozen-model re-encode, never an
    # index scan), their lists rewritten filtered, emptied list dirs
    # removed; the shrunk index must equal single-shot IVFADC built
    # without those vectors (parameterized exclusion oracle)
    "sim_ivf_delete": (
        similarity.ivf_delete_topk,
        similarity.ivf_delete_topk_oracle(),
    ),
    # r14: the maintenance quarter of the ANN lifecycle -- file-level
    # ingest appends fragment hot lists; compaction rewrites ONLY the
    # fragmented lists (partition-pruned read-back, dynamic overwrite,
    # one file per list), cold lists byte-identical; the compacted
    # store shares the single-shot IVFADC oracle
    "sim_ivf_compact": (
        similarity.ivf_compact_topk,
        similarity.ivf_compact_topk_oracle(),
    ),
    # r14: coarse-quantizer RETRAIN after heavy deletion -- membership
    # read ids-only from the aged store (ReadSchema raise-enforced),
    # survivors re-encoded under a DISJOINT new centroid range into a
    # new store; must answer like single-shot IVFADC with the new
    # model over the survivors (parameterized cent_lo + exclusion)
    "sim_ivf_recluster": (
        similarity.ivf_recluster_topk,
        similarity.ivf_recluster_topk_oracle(),
    ),
    # r12: Matryoshka prefix-dimension recall -- recall@k of 8/16/32-dim
    # truncated indexes vs the full-dim brute-force truth, the
    # acceptance gate before shipping a cheaper truncated index
    "emb_matryoshka_recall": (
        similarity.matryoshka_recall,
        similarity.matryoshka_recall_oracle(),
    ),
    # r12: streaming leg of the sliding-window funnel -- per-user
    # levels maintained live (state = the user's own stage timestamp
    # lists), monotone re-emissions finished batch-side with max();
    # shares the batch op's oracle, agreement is the proof
    "stream_window_funnel": (
        streaming.window_funnel_stream,
        streaming.window_funnel_stream_oracle(),
    ),
    # r15: streaming tail of the snapshot manifest chain (VERDICT r14
    # #6) -- commit-time change feed derived from the manifest diff
    # alone (Delta CDF discipline), then a maxFilesPerTrigger=1
    # file-source readStream where each commit is raise-enforced to
    # ride its OWN micro-batch; bounded-state aggregate (one group per
    # (version, change)); oracle recomputes both deltas from raw
    "stream_cdc_tail": (
        streaming.cdc_tail_stream,
        streaming.cdc_tail_stream_oracle(),
    ),
    # r12: per-doc novelty -- fraction of a doc's distinct K-gram spans
    # FIRST seen in it (the data-accumulation dual of dedup_substring's
    # copied fraction; same gram machinery)
    "text_novelty_curve": (
        text.novelty_curve,
        text.novelty_curve_oracle(),
    ),
    # r14: the ACTUAL BPE trainer loop (apply-merge-and-recount for K
    # rounds; merged symbols feed later merges) -- one memoized corpus
    # word count, then vocab-sized iterations; the U+001F-delimited
    # string replace IS the left-to-right non-overlapping merge in both
    # engines; oracle unrolls the same K stages as chained CTEs
    "text_bpe_train": (
        text.bpe_train_merges,
        text.bpe_train_merges_oracle(),
    ),
    # r14: apply the K trained merges and measure the tokens-per-word
    # compression -- the acceptance metric before shipping a tokenizer;
    # shares the trainer's loop + memoized word table; one row of exact
    # integers + one correctly-rounded division
    "text_bpe_apply": (
        text.bpe_apply_stats,
        text.bpe_apply_stats_oracle(),
    ),
    # r15: per-document tokenizer ENCODE under the K trained merges --
    # the token-ids emission a training run consumes (VERDICT r14
    # missing #2); zero-shuffle narrow projection (K chained replaces
    # inside a transform lambda), ids_hash pins the full ordered id
    # sequence per doc; oracle reuses the trainer CTE chain with the
    # b1..bK one-row merge tables cross-joined in
    "text_bpe_encode": (
        text.bpe_encode_docs,
        text.bpe_encode_docs_oracle(),
    ),
}
