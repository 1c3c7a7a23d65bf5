"""Text analysis over the ``documents`` table — language-ID, quality
scoring, token counting, fingerprinting (training-data-pipeline ops).

All counting kernels are vectorized ``pyarrow.compute`` regex ops
(zero-copy Arrow in/out); only the md5 fingerprint walks rows (hashlib's C
md5, ~1 us/row).  Integer outputs everywhere so the DuckDB oracle can match
value-hashes exactly (no float summation-order hazards).

Reference linkage: the reference has no document analytics; these extend the
engine for large-scale training-data pipelines (token counting mirrors the
reference's ``__w_plus`` retokenization idea, matcher.py:122 / _name_pre.py:42).
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa
import pyarrow.compute as pc

# shared with the SQL oracle (__ray_entry__.oracle_sql) — keep in sync
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")
_RE_TOKEN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"  # BPE-ish word/number/punct split
_RE_PUNCT = r"[^A-Za-z0-9\s]"
_RE_WS_TOKEN = r"\S+"

# tiny per-language profiles for the n-gram/stopword heuristic language ID
_LANG_MARKERS = {
    "en": {"the", "and", "of", "is", "with", "for"},
    "de": {"der", "die", "und", "das", "nicht", "ist"},
    "fr": {"le", "la", "les", "et", "est", "une"},
    "es": {"el", "los", "las", "es", "una", "que"},
    "zh": set(),  # detected by CJK codepoint ratio instead
}


def text_stats_batch(batch: pa.Table, *, text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """(id, text) -> integer quality/count features, all vectorized."""
    text = batch.column(text_col)
    n_chars_m = pc.utf8_length(text)
    n_tokens = pc.count_substring_regex(text, _RE_WS_TOKEN)
    n_tokens_re = pc.count_substring_regex(text, _RE_TOKEN)
    n_punct = pc.count_substring_regex(text, _RE_PUNCT)
    lower = pc.utf8_lower(text)
    stop_alt = "|".join(STOPWORDS)
    n_stop = pc.count_substring_regex(lower, rf"\b(?:{stop_alt})\b")
    # quality flag in pure integer arithmetic (SQL-identical)
    ok = pc.and_(
        pc.greater_equal(n_tokens, 5),
        pc.greater_equal(pc.multiply(n_stop, 100), pc.multiply(n_tokens, 2)),
    )
    return pa.Table.from_arrays(
        [
            batch.column(id_col),
            pc.cast(n_chars_m, pa.int64()),
            pc.cast(n_tokens, pa.int64()),
            pc.cast(n_tokens_re, pa.int64()),
            pc.cast(n_punct, pa.int64()),
            pc.cast(n_stop, pa.int64()),
            pc.cast(ok, pa.int64()),
        ],
        names=[id_col, "n_chars_m", "n_tokens", "n_tokens_re", "n_punct",
               "n_stop", "quality_ok"],
    )


def text_stats(docs_ds, *, text_col: str = "text", id_col: str = "doc_id"):
    return docs_ds.map_batches(
        lambda b: text_stats_batch(b, text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
    )


_NON_ALNUM = re.compile(r"[^a-z0-9]")


def fingerprint_batch(batch: pa.Table, *, text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    """md5 over the lowercase alnum-collapsed text (== DuckDB
    ``md5(regexp_replace(lower(text),'[^a-z0-9]','','g'))``)."""
    texts = pc.utf8_lower(batch.column(text_col)).to_pylist()
    sub = _NON_ALNUM.sub
    fps = [hashlib.md5(sub("", t or "").encode()).hexdigest() for t in texts]
    return pa.Table.from_arrays(
        [batch.column(id_col), pa.array(fps, pa.string())],
        names=[id_col, "fingerprint"],
    )


def fingerprints(docs_ds, *, text_col: str = "text", id_col: str = "doc_id"):
    return docs_ds.map_batches(
        lambda b: fingerprint_batch(b, text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
    )


def word_counts(docs_ds, *, text_col: str = "text", min_count: int = 1):
    """Corpus word frequencies (the reference's unique-word corpus stats,
    coname.py:221-244, generalized): explode lowercase whitespace tokens with
    per-batch partial counts, then one small groupby-Sum shuffle."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(batch.column(text_col)), r"\s+")
        flat = toks.combine_chunks().flatten() if isinstance(toks, pa.ChunkedArray) \
            else toks.flatten()
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table({
            "word": vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        })

    out = docs_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("n", alias_name="n"))
    if min_count > 1:
        out = out.filter(expr=f"n >= {min_count}")
    return out


class RollingFingerprint:
    """Winnowing-style document fingerprint: k-gram hashes, keep the
    minimum hash in each sliding window of ``w`` — robust to local edits.

    Stateless math, but expressed as a callable class so the compiled regex
    and parameters live once per actor.  The k-gram hash is the low 64 bits
    of md5 over the space-joined k-gram (== DuckDB ``md5_number_lower``, so
    the SQL oracle reproduces ``fp_len`` exactly) — a process-stable digest;
    the previous Python ``hash(tuple(...))`` was PYTHONHASHSEED-randomized,
    so fingerprints from different Ray workers were not comparable.
    """

    def __init__(self, k: int = 5, w: int = 4, text_col: str = "text",
                 id_col: str = "doc_id"):
        self.k, self.w = k, w
        self.text_col, self.id_col = text_col, id_col
        self.token_re = re.compile(r"\S+")

    def _doc_fp(self, text: str) -> list[int]:
        toks = self.token_re.findall(text.lower())
        if len(toks) < self.k:
            return []
        md5 = hashlib.md5
        hs = [
            int.from_bytes(
                md5(" ".join(toks[i:i + self.k]).encode()).digest()[8:16],
                "little",
            ) & 0x7FFFFFFFFFFFFFFF
            for i in range(len(toks) - self.k + 1)
        ]
        out, prev = [], None
        for i in range(max(1, len(hs) - self.w + 1)):
            m = min(hs[i:i + self.w])
            if m != prev:
                out.append(m)
                prev = m
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        fps = [self._doc_fp(t or "") for t in texts]
        return pa.Table.from_arrays(
            [batch.column(self.id_col),
             pa.array(fps, pa.list_(pa.int64())),
             pa.array([len(f) for f in fps], pa.int64())],
            names=[self.id_col, "winnow_fp", "fp_len"],
        )


class LangId:
    """Heuristic language ID: CJK codepoint ratio, else stopword-marker votes
    per language (n-gram heuristic).  Compiled once per actor."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col
        self.word_re = re.compile(r"[a-zà-ÿ]+")

    @staticmethod
    def _cjk_ratio(t: str) -> float:
        if not t:
            return 0.0
        n = sum(1 for c in t if "一" <= c <= "鿿")
        return n / len(t)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        preds, confs = [], []
        for t in texts:
            t = (t or "").lower()
            if self._cjk_ratio(t) > 0.2:
                preds.append("zh")
                confs.append(1.0)
                continue
            words = set(self.word_re.findall(t))
            scores = {
                lang: len(words & markers)
                for lang, markers in _LANG_MARKERS.items() if markers
            }
            best = max(scores, key=lambda l: (scores[l], l))
            total = sum(scores.values())
            preds.append(best if scores[best] > 0 else "unknown")
            confs.append(scores[best] / total if total else 0.0)
        return pa.Table.from_arrays(
            [batch.column(self.id_col),
             pa.array(preds, pa.string()),
             pa.array(confs, pa.float32())],
            names=[self.id_col, "lang_pred", "lang_conf"],
        )


def lang_id(docs_ds, *, concurrency=(1, 4), **cols):
    return docs_ds.map_batches(
        LangId, fn_constructor_kwargs=cols, batch_format="pyarrow",
        concurrency=concurrency,
    )
