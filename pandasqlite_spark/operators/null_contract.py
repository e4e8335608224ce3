"""Per-key NULL data contracts — the machine-checked catalogue of
which columns an operator REQUIRES to be non-null (round-5 verdict #1).

Every `queries()` key falls in exactly one class under the null-heavy
sweep (`scripts/driver_sweep.py <nulls_twin> --null-contract`):

- **green** — matches its DuckDB oracle even when every non-key column
  carries nulls (most keys; includes the ~45 keys PINNED in round 6
  with explicit `asc_nulls_last`/`NULLS LAST`, null-guarded `size()`,
  and the `load_events_timeline` time-ordered contract).
- **contracted** — listed here: the key's semantics REQUIRE the named
  columns non-null (an ANN index has no distance to a missing vector;
  a Pareto frontier has no dominance order over a missing dimension).
  The sweep re-runs each contracted key against a twin where ONLY its
  contracted columns are restored non-null (everything else still
  nulled) and requires a full value match there — so a wrong or stale
  contract FAILS, it doesn't hide.
- **DIVERGED** — neither; the sweep exits non-zero.  This class must
  stay empty.

Column syntax: ``table.column`` over the driver's 10-table star
schema.  Keys NOT listed here assert green-under-nulls.
"""

from __future__ import annotations

_EMB = ["embeddings.embedding"]
_TXT = ["documents.text"]

#: key -> {"not_null": [table.column, ...], "reason": one-liner}
NULL_CONTRACT: dict[str, dict] = {}


def _family(keys: list[str], cols: list[str], reason: str) -> None:
    for k in keys:
        NULL_CONTRACT[k] = {"not_null": list(cols), "reason": reason}


_family(
    [
        "cluster-kmeans",
        "embedding-assign",
        "embedding-centroid-accuracy",
        "embedding-centroids",
        "embedding-dim-stats",
        "embedding-matryoshka-recall",
        "embedding-quantization-error",
        "embedding-quantize",
        "embedding-triplet-mine",
        "arrow-batch-quantize",
        "simsearch-hamming-recall",
        "simsearch-ivf-kmeans",
        "simsearch-ivf-knn-join",
        "simsearch-ivf-pq",
        "simsearch-knn-join",
        "simsearch-nprobe-curve",
        "simsearch-ivf-derived",
        "simsearch-pq-adc",
        "simsearch-recall-eval",
        "rank-ndcg-eval",
        "rank-mrr-eval",
    ],
    _EMB,
    "vector index/distance semantics are undefined over a NULL "
    "embedding — a production pipeline drops or imputes null vectors "
    "before indexing (the ANN twin of the multimodal null-blob "
    "contract)",
)

_family(
    [
        "corpus-token-budget",
        "dedup-incremental",
        "pack-sequences",
        "text-fingerprint",
        "text-langid",
        "text-langid-confusion",
        "text-length-histogram",
        "text-rare-token-ratio",
        "text-tokenize",
    ],
    _TXT,
    "tokenization/fingerprint/language statistics over a NULL document "
    "body have no defined value; the ingest layer's null-blob contract "
    "filters these upstream",
)

_family(
    ["mixture-token-weighted", "mixture-sqrt-temperature", "mixture-epoch-schedule"],
    ["documents.source", "documents.text"],
    "mixture weights divide per-SOURCE token mass (token_count over "
    "text) — a row with no source or body cannot be assigned to a "
    "mixture component",
)

_family(
    ["corpus-quantile-normalize"],
    ["documents.source", "documents.n_chars"],
    "quantile normalization maps within-SOURCE ranks of the size "
    "measure onto the global distribution; a null source or measure "
    "has no rank position",
)

_family(
    ["asof-join", "asof-join-forward", "asof-join-nearest"],
    ["events.ts"],
    "an as-of join matches on the TIME axis; a null-ts row has no "
    "as-of position (same timeline contract as load_events_timeline)",
)

_family(
    ["history-scd2", "join-temporal-scd2"],
    ["events.ts", "events.value"],
    "SCD2 validity intervals derive from the change TIME and the "
    "tiered measure; a null timestamp or measure has no interval "
    "position (the timeline contract)",
)

_family(
    ["skyline-pareto"],
    ["part.p_retailprice", "part.p_size"],
    "Pareto dominance is a partial order over BOTH dimensions; a "
    "missing coordinate makes dominance three-valued (engines "
    "disagree on UNKNOWN handling by design)",
)

_family(
    ["validate-k-anonymity", "validate-l-diversity"],
    ["events.ts", "events.value", "events.event_type"],
    "the anonymity audits' quasi-identifier is (event_type, "
    "hour-of-day, value decile) — a null component has no equivalence "
    "class, and the decile ntile ranks nulls differently per engine",
)

_family(
    ["events-mann-whitney"],
    ["events.value", "events.event_type"],
    "the U statistic ranks the measure between two labelled samples; "
    "null measures/labels belong to neither sample",
)
