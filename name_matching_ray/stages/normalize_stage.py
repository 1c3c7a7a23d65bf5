"""Normalization as a stateful actor-pool stage (SURVEY.md §2.3 T1/T2).

The reference runs ``name_preprocessing`` + ``remove_suffix`` over both tables
with pandarallel (matcher.py:436-445), sharing compiled regexes/dictionaries
via fork.  Here the compiled :class:`Normalizer` (~300 regexes + a 29k-branch
location alternation + dictionary sets) is built ONCE per actor in
``__init__`` and applied per batch; rows whose preprocessing returns ``None``
(person names) or whose ``nosuffix`` is empty are dropped inside the same
batch via an Arrow mask — no separate filter pass.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.normalize import Normalizer


class NormalizeNames:
    """map_batches callable class: adds pre_proc / nosuffix / block keys."""

    def __init__(self, remove_people: bool = True, asset_dir: str | None = None):
        from ..functions.assets import load_assets

        self.norm = Normalizer(load_assets(asset_dir))
        self.remove_people = remove_people

    def __call__(self, batch: pa.Table) -> pa.Table:
        names = batch.column("name").to_pylist()
        pre_list, nos_list, first_list, last_list, keep = [], [], [], [], []
        preprocess = self.norm.preprocess
        remove_suffix = self.norm.remove_suffix
        for raw in names:
            pre = preprocess(raw, self.remove_people) if raw else None
            if not pre:
                keep.append(False)
                continue
            nos = remove_suffix(pre)
            toks = nos.split()
            if not toks:
                keep.append(False)
                continue
            keep.append(True)
            pre_list.append(pre)
            nos_list.append(nos)
            first_list.append(toks[0])
            last_list.append(toks[-1])
        filtered = batch.filter(pa.array(keep))
        return (
            filtered.append_column("pre_proc", pa.array(pre_list, pa.string()))
            .append_column("nosuffix", pa.array(nos_list, pa.string()))
            .append_column("block_key", pa.array(first_list, pa.string()))
            .append_column("block_key_last", pa.array(last_list, pa.string()))
        )


def normalize_names(ds, *, remove_people: bool = True, concurrency=(1, 8),
                    batch_size: int | None = None, num_cpus: float = 1):
    """Attach normalized columns via an autoscaling actor pool."""
    return ds.map_batches(
        NormalizeNames,
        fn_constructor_kwargs={"remove_people": remove_people},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )
