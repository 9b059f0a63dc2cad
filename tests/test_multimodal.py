"""Multimodal plumbing beyond the oracle-gated entries: audio-style
overlapping windows vs a python reference."""

from ts_etl_spark.operators.multimodal import (
    AUDIO_HOP,
    AUDIO_WIN,
    audio_windows,
)
from ts_etl_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _py_windows(payload: bytes, win: int, hop: int):
    n = len(payload)
    n_wins = max((n - win) // hop + 1, 0) if n >= win else (1 if n else 0)
    out = []
    for i in range(n_wins):
        w = payload[i * hop : i * hop + win]
        out.append((i, len(w), sum(b * b for b in w), max(w)))
    return out


def test_audio_windows_match_python_reference(spark):
    docs = {
        r.doc_id: r.text.encode("utf-8")
        for r in load_table(spark, SF, "documents").select("doc_id", "text").collect()
    }
    got = {}
    for r in audio_windows(spark, SF).collect():
        got.setdefault(r.doc_id, []).append(
            (r.win_idx, r.n_samples, r.energy, r.peak)
        )
    n_with_windows = 0
    for doc_id, payload in docs.items():
        want = _py_windows(payload, AUDIO_WIN, AUDIO_HOP)
        have = sorted(got.get(doc_id, []))
        assert have == want, doc_id
        n_with_windows += bool(want)
    assert n_with_windows > 0


def test_audio_windows_overlap(spark):
    """With hop < win the windows overlap — a sample is covered by up to
    win/hop windows (the defining property of hop-windowed analysis)."""
    docs = {
        r.doc_id: r.text.encode("utf-8")
        for r in load_table(spark, SF, "documents").select("doc_id", "text").collect()
    }
    got = {}
    for r in audio_windows(spark, SF, win=100, hop=40).collect():
        got.setdefault(r.doc_id, []).append(
            (r.win_idx, r.n_samples, r.energy, r.peak)
        )
    assert any(len(v) >= 3 for v in got.values())
    for doc_id, payload in docs.items():
        assert sorted(got.get(doc_id, [])) == _py_windows(payload, 100, 40), doc_id
