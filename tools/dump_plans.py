"""Regenerate PLANS.md: formatted physical plans of flagship queries.

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_mit_spark import registry
from mapreduce_mit_spark.session import get_spark

FLAGSHIPS = {
    "q01_pricing_summary": "filter pushdown + partial/final hash aggregate",
    "q02_filter_project": "predicates and column pruning reaching the parquet scan",
    "q20_broadcast_join": "dimension joins broadcast — no fact shuffle",
    "q22_multiway_join": "join ordering across fact + three broadcast dims",
    "q28_asof_join": "as-of via single window pass (no pairwise join)",
    "q40_global_topk": "top-k fused into TakeOrderedAndProject (no global sort)",
    "q17_percentiles": "exact quantiles via distributed window sort (no hashmap merge)",
    "q61_inverted_index": "single-phase set aggregation (doc count derived from the set)",
    "q81_minhash_lsh": "minhash banding: narrow signatures, one band-key shuffle",
    "q85_cosine_topk": "brute-force ANN: broadcast query vector, linear scan, no exchange",
    "q72_session_window": "session-window merge in one shuffle on user_id",
    "q67_bitmap_distinct": "blocked-bitmap distinct: no Expand, fixed-width bit_or state",
    "q68_ivf_ann": "IVF: broadcast codebook assignment, argmax agg, probed-list search",
    "q37_pack_sequences": "packing: window + agg share ONE lang exchange (partitioning reuse)",
    "q38_doc_chunks": "chunking: generator explode, codegen, zero data shuffles",
    "q39_mixture_sample": "mixture: pure per-row predicate, no exchange before output sort",
    "q116_forecast_revenue": "TPC-H Q6: all range predicates pushed, single partial->final gather",
    "q117_market_share": "TPC-H Q8: 8-table join, six broadcast dims, one fact-fact shuffle",
    "q126_waiting_suppliers": "TPC-H Q21: EXISTS pair decorrelated to one per-order agg, top-k fused",
    "q128_minmax_scale": "per-group stats broadcast back: fact side never shuffles for scaling",
    "q132_scd2_history": "SCD2: lag + change-filter + lead share one user_id exchange",
    "q133_cdc_upsert": "CDC merge: per-side row_number dedup and the full-outer join on one key",
    "q140_robust_outliers": "median+MAD: two distributed-sort quantile passes, stats broadcast back",
    "q142_funnel": "ordered funnel: per-step min-aggregates, all joins co-keyed on user_id",
    "q09_span_dedup": "span doc-frequency as agg + join-back (AQE skew-splittable, no window)",
    "q86_nn_per_label": "blocked kNN: (label, sub) capped blocks, population join broadcast",
    "q89_ann_probe": "multi-probe LSH ANN + in-band recall audit, all joins broadcast",
    "q139_table_profile": "schema-driven profile: one scan/table, multi-distinct Expand, free union",
    "q153_quantiles_giant_groups": "quantiles without per-group single-task sort: pid-bounded ranks + broadcast prefixes",
    "q148_dedup_pipeline": "end-to-end dedup: merge-pinned band self-join, salted verify, agg+join cluster sizes",
    "q149_unigram_logprob": "unigram-LM fluency gate: corpus LM as a broadcast-normalized frequency table",
    "q156_temperature_mix": "temperature rebalancing: rates from one broadcast per-source aggregate",
    "q157_pq_ann": "PQ ANN: broadcast codebooks+LUT, code-only ADC, shortlist-bounded rerank",
    "q158_fuzzy_decontamination": "fuzzy decontamination: windowed train bands vs broadcast eval bands",
    "q159_split_leakage": "split leakage: cross-split predicate inside the band self-join",
    "q160_ivfadc": "IVFADC: probed-cell ADC via broadcast LUT equi-join, codes replace vectors",
    "q161_incremental_dedup": "incremental dedup: broadcast batch probes, corpus never shuffles",
    "q164_semantic_dedup": "SemDeDup: fitted IVF cells bound the quadratic; greedy rule per cell",
    "q165_sketch_overlap_triage": "overlap triage: O(S^2) over kilobyte HLL sketches, broadcast pair expansion",
    "q166_classifier_filter": "hashing-trick classifier: broadcast weight vector, one doc_id combine",
    "q167_cluster_safe_split": "cluster-safe split: q148's closure reused, split tag a pure map over it",
    "q168_stream_ann_serve": "streaming ANN serve: attach once, each micro-batch probes broadcast cells",
    "q169_pydatasource_sink": "custom writer roundtrip: one file per task, rename-commit, checksum reduce",
    "q170_corpus_to_trainer": "capstone: gates -> closure -> cluster split -> mixture -> packing, one funnel",
    "q172_ann_multitable_lsh": "multi-table LSH: fitted key table, broadcast probes, id-gather then exact rerank",
    "q173_trainer_dedup_first": "dedup-first capstone: closure over the raw corpus, gates on survivors only",
    "q175_ivf_incremental_serve": "index freshness: increment assigns to the standing codebook, no refit",
}


# Fixed prose epilogue — survives regeneration (this tool rewrites
# PLANS.md wholesale).
EPILOGUE = """
## The standing-corpus dedup lifecycle (q148 → q161 → re-closure)

The production loop a 100 TB pipeline actually runs, stitched from
the two operators above:

1. **Initial build**: `q148_dedup_pipeline` over the raw corpus —
   exact pre-pass (when the dup-mass probe fires) → LSH candidates →
   Jaccard verify → connected components → one survivor per cluster.
   The survivors plus the maintained band table (`lsh_bands_for`,
   persistable via `lsh_index_save`) ARE the standing corpus.
2. **Each crawl increment**: dedup the batch internally with q148
   (batch-sized — cheap), then classify its survivors against the
   standing corpus with `q161` / `incremental_dedup_df`: batch hashes
   and bands broadcast, the corpus never shuffles and no corpus-corpus
   pair is ever formed. Admit the `status='new'` docs; append their
   band rows to the band table.
3. **When to re-run the full closure**: incremental admission is
   greedy — it never merges two ALREADY-ADMITTED corpus docs, so the
   only drift source is near-dup clusters that grow links *between*
   existing corpus members via later evidence (possible only if the
   original build's candidate generation missed the pair). Bound it
   with the cluster-growth signal: track the fraction of increments
   classified `near_dup` whose match scores fall near the 0.8
   threshold; re-run q148 over the full corpus when cumulative
   admissions since the last closure exceed ~the original corpus size
   (cheap, amortized: one full build per corpus doubling), or when an
   audit sample of corpus-corpus candidate pairs (band table
   self-join on a hash-sample) surfaces verified pairs.

Equivalence contract: with clique-shaped near-dup groups and ids
growing batch-over-batch (fresh crawl ids are larger), the chained
loop lands on EXACTLY the survivor set of a from-scratch q148 over
the union — pinned by
`tests/test_operators.py::test_incremental_dedup_chained_equals_full_rebuild`.

### The streaming forms (q162 → q163)

The same lifecycle as it actually runs in production — continuously,
not as cron-batch jobs:

- **`q162_stream_incremental_dedup`** is step 2 as a stream with the
  corpus FROZEN for the stream's lifetime: the increment arrives as
  micro-batches (`maxFilesPerTrigger`), `foreachBatch` runs
  `classify_increment` against corpus artifacts built ONCE before the
  stream starts (band table sliced from the `lsh_bands_for` memo —
  attachable from `lsh_index_save` output — and a checkpointed
  content-hash table). Classification is per-document and the corpus
  is static, so the streamed union is batch-boundary-independent and
  equals batch q161 — stream == batch == the same SQL oracle. Exact
  tier: the case-folding `norm_text` hash, q161's classification
  contract (aligned with q80's user-facing exact dedup).
- **`q163_stream_corpus_admission`** is the step the frozen-corpus
  form cannot express: ADMISSION, with the corpus EVOLVING across
  micro-batches. Each increment is classified against the corpus as
  extended by all previous admissions; `status='new'` docs are
  admitted by APPENDING `batch_id=N` partitions to the docs/bands/
  hashes trees (never rewriting), with a driver-side atomic meta
  pointer — crash between partition write and pointer flip leaves a
  readable consistent state, and a foreachBatch redelivery overwrites
  its own partition (the q115 exactly-once discipline). Exact tier:
  q148's TOKEN-SEQUENCE collapse key, NOT the case-folding hash —
  admission's contract is rebuild-equivalence, and q148 keeps
  case-variant docs, so a case-folding gate would drop docs the
  rebuild keeps. State roots are fingerprint-keyed per fixture
  (`fp_stream_root`) and process-leased (`tree_lock`).

Streaming equivalence contract: the final admitted corpus equals a
from-scratch q148 rebuild over initial ∪ all increments — pinned by
`tests/test_streaming.py::test_stream_admission_equals_full_rebuild`
(case-variant and token-identical fixtures included). At 100 TB the
partition appends become Delta/Iceberg transactional appends and the
meta pointer a table-version commit; the per-batch plan shapes carry
over unchanged.

## The corpus→trainer capstone (q170)

`q170_corpus_to_trainer` composes the catalog's training-pipeline
stages into the ONE chain a pretraining data team actually ships, and
value-checks the whole composition cross-engine (the per-stage funnel
— counts AND token totals per language — is the query result, so the
oracle replays every stage, not just the final table):

1. **raw → curated**: q145's gate cores (q09 span share, q63
   integer-exact quality). Capstone adjustments, both deliberate: no
   language gate (language treatment is stage 5's mixture rates — the
   capstone targets a multilingual trainer), and the span gate drops a
   doc only when >90% of its spans are cross-doc boilerplate (q145's
   standalone majority rule would double-count the near-dup mass that
   stage 2 is about to remove).
2. **curated → dedup survivors**: q148's closure — the memoized band
   table is filtered to curated docs BEFORE the self-join (curation
   shrinks the candidate quadratic), then salted Jaccard verify on
   candidates only and pointer-jumped connected components; survivors
   are the min-id representatives (the cluster labels themselves).
3. **survivors → train arm**: q167's cluster-keyed md5 arm — near-dups
   cannot straddle train/test even before representatives are picked.
4. **train → mixture**: q39's per-language md5-threshold sampling.
5. **mixture → packed**: q37's exclusive-prefix-sum packing; the final
   `n_bins` is the number of context windows the trainer reads.

Cost shape: no stage adds a corpus-sized structure beyond its
standalone query; `sized` (doc_id, lang, n_tokens) is lazily
checkpointed so the corpus tokenizes once for all six funnel branches,
and the curated doc-id list is eagerly checkpointed so the span/quality
subtree runs once for its three consumers (funnel branch, band filter,
CC node set). Warm wall at sf0.1 ≈ q148 + gates (~7 s on the r12 box —
the closure dominates, as it should).
"""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    registry.load_all_plans()
    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS — physical plans of flagship queries\n",
        f"\nGenerated by `python tools/dump_plans.py {sf_dir}` "
        "(re-run after plan-affecting changes). These are the shapes\n"
        "`tests/test_plan_shapes.py` pins; shown here so plan quality is\n"
        "reviewable without running Spark.\n",
    ]
    for name, why in FLAGSHIPS.items():
        df = registry.REGISTRY[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        out.append(f"\n## {name}\n\n*{why}*\n\n```\n{buf.getvalue().strip()}\n```\n")
    out.append(EPILOGUE)
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("".join(out))
    print("PLANS.md written")


if __name__ == "__main__":
    main()
