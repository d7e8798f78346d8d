package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract: a typo'd oracle key or a missing ORDER
  * BY silently zeroes a round's correctness signal, so the contract is
  * spec-enforced.
  */
class QueryContractSpec extends AnyFunSuite {

  test("every oracle key has a matching query key") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every oracle ends in a total ORDER BY (driver hashes row order)") {
    val missing = SparkEntry.oracleSql.collect {
      case (k, sql) if !sql.toUpperCase.contains("ORDER BY") => k
    }
    assert(missing.isEmpty, s"oracles missing ORDER BY: $missing")
  }

  test("declared surface matches the documented round-10 inventory") {
    // r9: corpus_summary_approx converted from HLL (golden-pinned, no
    // oracle) to a KMV bottom-k sketch over the portable hash64 — now
    // DuckDB-oracle-verified like everything else. No-oracle count: 0.
    // +7 in r9: dedup_semantic[_pairs|_cluster]_embeddings (SemDeDup
    // pairs / keep set / transitive-closure groups),
    // select_budget_documents (token-budget curation),
    // dedup_minhash_quality_documents (sketch P/R/F1 report),
    // embedding_stats_embeddings (vector-table health),
    // source_drift_documents (crawl-over-crawl QA)
    // +1 late r9: quality_sweep_documents (minQuality tuning curve)
    // +5 in r10: dedup_substring_documents (ExactSubstr span removal),
    // media_phash_pairs_documents (aHash image near-dup),
    // bigram_logprob_documents (stupid-backoff bigram LM),
    // gopher_rules_documents (Rae et al. word-level heuristics),
    // dsir_select_documents (hashed-n-gram importance resampling),
    // bpe_vocab_documents (Sennrich BPE merge table, unrolled-CTE oracle),
    // similarity_pq[_recall]_embeddings (ADC product quantization),
    // similarity_ivfpq_embeddings (IVF -> PQ shortlist -> exact re-rank)
    // +4 in r11: bpe_encode_documents (trained merge table applied —
    // tokenizer-true per-doc BPE token counts),
    // similarity_knn_join_embeddings (probe-TABLE batch kNN join —
    // the streaming retrieval kernel as a declared key),
    // media_audiohash_pairs_documents (PCM energy-envelope near-dup),
    // curate_bpe_documents (budget selection on tokenizer-true costs),
    // media_videohash_pairs_documents (temporal-brightness AVI
    // near-dup — the image/audio/video content-dedup triple complete),
    // quality_classifier_documents + classifier_select_documents
    // (trained discriminative quality filter: portable full-batch
    // logistic regression, gradient trajectory oracle-replayed),
    // similarity_knn_join_pq_embeddings (the batch kNN join through
    // the production IVF->PQ-ADC->re-rank stack, probes as data),
    // similarity_knn_join_recall_embeddings (per-probe recall@10 of
    // that stack vs brute-force ground truth over the same batch),
    // perplexity_buckets_documents (CCNet head/middle/tail terciles
    // per language under the trained bigram LM),
    // bigram_apply_documents (train-once-apply-many: the frozen model
    // scores held-out docs through one codegen'd projection),
    // hard_negatives_embeddings (contrastive-training negative mining:
    // the kNN-join kernel + a label != probe_label candidate filter),
    // embedding_project_embeddings (Johnson–Lindenstrauss sign
    // projection: hash-seeded ±1/√k matrix, exact 6-dp accumulation),
    // knn_classify_embeddings (leave-one-out majority-vote kNN over
    // the shared IVF kernel — the embedding-quality gate),
    // embedding_project_recall_embeddings (per-probe recall@10 of
    // projected-space retrieval vs full-dim ground truth),
    // bpe_tokens_documents (the exported token STREAM — ordered BPE
    // symbols per doc, sharing one apply kernel with the counts),
    // classifier_apply_documents (train-once-apply-many for the
    // discriminative filter: frozen weights score held-out docs),
    // dedup_minhash_incremental_documents (rolling-corpus near-dup
    // maintenance: one banded index, corpus-wins drop policy)
    // +r12: pack_sequences_documents (GPT-lineage concat-and-chunk:
    // fixed 512-token training blocks over the trained-BPE stream,
    // global offsets via a two-level distributed scan),
    // dedup_cluster_keep_quality_documents (production keep policy:
    // highest-quality member per near-dup cluster, min-id ties),
    // prune_prototypes_embeddings (Sorscher 2022 SSL-prototype pruning:
    // per-cluster hard-example keep under the portable Lloyd index),
    // d4_select_embeddings (Tirumala 2023: SemDeDup then RE-CLUSTER
    // survivors and prototype-prune — the composed curation verdict),
    // sample_temperature_documents (XLM α=0.5 language rebalancing:
    // integer ⌊√n⌋ quotas, content-addressed within-language pick),
    // tokenizer_fertility_documents (per-lang BPE tokens/word audit),
    // decontaminate_bloom_documents (bloom-pruned decontamination:
    // fixed-size bitmap probe, only suspicious docs join),
    // shuffle_blocks_documents (content-addressed training-order
    // permutation of packed blocks, bucket-refined per-shard rank),
    // ivf_drift_embeddings (index-staleness report: per-cell cohesion
    // of the frozen index vs the arriving batch),
    // mixture_schedule_documents (stride/WFQ virtual-time schedule:
    // every training prefix holds the language weight proportions),
    // source_overlap_documents (pairwise source containment at segment
    // granularity — the drop/down-weight signal for mixture fitting).
    // Round 13 (SURVEY §2.16): trainer_order_documents (the composed
    // trainer terminal: pack -> shuffle -> stride schedule as ONE
    // oracle-pinned relation) and knn_graph_embeddings (kNN-graph
    // construction: the knn_join shape with probes = the corpus,
    // shuffle-join on centroid_id, self excluded), plus
    // label_propagation_embeddings (cosine-weighted majority label per
    // vertex over the kNN graph — decimal-exact votes, aggregate argmax).
    // Round 14 adds label_propagation_iter_embeddings (Zhu & Ghahramani
    // to fixed depth over the frozen graph), corpus_to_trainer_documents
    // (curate_full's survivors through the trainer terminal, end to
    // end), trainer_order_epoch_documents (the per-epoch reshuffle
    // salt), and knn_graph_refine_embeddings (one NN-Descent round),
    // then knn_graph_refine_iter_embeddings (NN-Descent to fixed
    // depth), curriculum_order_documents (quality-descending shard
    // streams), and corpus_to_trainer_curriculum_documents (the
    // curated contract with the curriculum order), and
    // block_provenance_documents (per-block source attribution of the
    // packed stream — the data-card relation) — see SURVEY §2.17.
    // Round 15 adds knn_graph_append_embeddings (incremental graph
    // maintenance: newcomer edges + exact re-rank of affected vertices,
    // oracle = the full rebuild), graph_search_embeddings (beam-search
    // retrieval over the frozen edge table, rounds unrolled in the
    // oracle), and similarity_ivf_appended_embeddings (serving THROUGH
    // an appendToClustered-maintained layout, oracle = rebuild over
    // the union) — see SURVEY §2.18. Round 16 adds
    // graph_search_clustered_embeddings (cell-restricted serving from
    // the persisted clustered edge layout — PartitionFilters-pruned)
    // knn_graph_appended_embeddings (appendToGraphClustered
    // lifecycle: persist → two appends + re-delivery → serve, oracle =
    // the rebuild), and graph_search_hnsw_embeddings (geometric layer
    // descent, every layer's graph + walk oracle-unrolled) — see
    // SURVEY §2.19
    // r17 additions: hnsw_appended_embeddings (per-layer hierarchy
    // maintenance, oracle = rebuild-over-union per layer),
    // media_phash_png_pairs_documents (PNG inflate+unfilter decode,
    // differential oracle), dedup_substring_ranged_documents (the
    // hash-range scratch remedy, single-sort oracle verbatim) — see
    // SURVEY §2.20
    assert(SparkEntry.queries.size == 173,
      s"query count drifted: ${SparkEntry.queries.size} (update SURVEY §2.20 if intentional)")
    assert(SparkEntry.oracleSql.size == SparkEntry.queries.size,
      s"oracle count drifted: ${SparkEntry.oracleSql.size} of ${SparkEntry.queries.size} " +
        "(every declared key is oracle-checked as of r9; update SURVEY §2.13 if intentional)")
  }

  test("no query key collides across catalog sections") {
    // bronze + merge + ext maps are ++-merged; a duplicate key would
    // silently shadow an earlier query
    val bronze = QueryCatalog.queries.keySet.filter(_.startsWith("bronze_"))
    val ext = ExtQueries.queries.keySet
    assert((bronze intersect ext).isEmpty)
  }
}
