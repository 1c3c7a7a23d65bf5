"""Pairwise scoring as an actor-pool map_batches stage (SURVEY.md §3.4).

One :class:`Matcher` (dictionaries + compiled regexes + kernels) per actor,
built in ``__init__``; per batch, each candidate pair runs the reference's
cheap gate (``token_set_ratio(nosuffix) > 50``, matcher.py:385) and then the
full §2.6 decision cascade.  Output schema is PAIRS_SCHEMA; by default only
matched pairs (``rule_code > 0``) are emitted, mirroring matcher.py:386.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.rules import Matcher
from ..functions.similarity import token_set_ratio, token_sort_ratio

CUTOFF = 50


class ScorePairs:
    def __init__(self, keep_all: bool = False, asset_dir: str | None = None,
                 metrics: bool = False):
        from ..functions.assets import load_assets

        self.matcher = Matcher(load_assets(asset_dir))
        self.keep_all = keep_all
        self.metrics = None
        if metrics:
            from ..state.metrics import get_metrics_actor

            self.metrics = get_metrics_actor()

    def __call__(self, batch: pa.Table) -> pa.Table:
        pre_a = batch.column("pre_a").to_pylist()
        pre_b = batch.column("pre_b").to_pylist()
        nos_a = batch.column("nosuffix_a").to_pylist()
        nos_b = batch.column("nosuffix_b").to_pylist()
        match = self.matcher.match

        keep, codes, scores = [], [], []
        for i in range(len(pre_a)):
            if token_set_ratio(nos_a[i], nos_b[i]) > CUTOFF:
                code = int(match(pre_a[i], pre_b[i]))
            else:
                code = -100  # failed the candidate gate (our diagnostic code)
            matched = code > 0
            if matched or self.keep_all:
                keep.append(i)
                codes.append(code)
                # emitted score = token_sort_ratio on nosuffix (matcher.py:393)
                scores.append(token_sort_ratio(nos_a[i], nos_b[i]) if matched else 0.0)
        if self.metrics is not None:
            # fire-and-forget: one tiny RPC per batch
            self.metrics.add.remote("pairs_scored", len(pre_a))
            self.metrics.add.remote("pairs_matched",
                                    sum(1 for c in codes if c > 0))
        take = pa.array(keep, pa.int64())
        return pa.Table.from_arrays(
            [
                batch.column("left_doc_id").take(take),
                batch.column("right_doc_id").take(take),
                batch.column("block_key").take(take),
                pa.array(codes, pa.int32()),
                pa.array(scores, pa.float32()),
            ],
            names=["left_doc_id", "right_doc_id", "block_key", "rule_code", "score"],
        )


def score_pairs(pairs_ds, *, keep_all: bool = False, concurrency=(1, 8),
                batch_size: int = 4096, num_cpus: float = 1,
                metrics: bool = False):
    return pairs_ds.map_batches(
        ScorePairs,
        fn_constructor_kwargs={"keep_all": keep_all, "metrics": metrics},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )
