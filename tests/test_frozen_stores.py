"""Guards on the committed frozen-quantizer store: the resource files
are load-bearing for ten oracle-backed queries (q38e/j/l, q153-q155 and
their SQL replays embed these exact floats as literals), so corruption
or an accidental retrain must fail loudly here, not as a cryptic
hash-mismatch at driver time."""

from __future__ import annotations

import json
import math
import os

from wing_binlog_go_spark.operators.similarity import (
    load_frozen_centroids,
    load_frozen_pq_books,
)

_RES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "wing_binlog_go_spark", "resources",
)


def test_frozen_centroids_shape_and_provenance():
    cents = load_frozen_centroids()
    assert len(cents) == 8 and all(len(c) == 64 for c in cents)
    assert all(math.isfinite(x) for c in cents for x in c)
    # distinct centroids (a degenerate retrain collapsing clusters
    # would silently merge every downstream cluster)
    assert len({tuple(c) for c in cents}) == 8
    meta = json.load(open(os.path.join(_RES, "centroids_q38e.json")))
    assert meta["seed"] == 42 and meta["k"] == 8
    assert meta["rounded_dp"] == 6
    # the loader returns exactly the committed floats — literals in
    # BOTH engines come from this one source
    assert cents == [[float(x) for x in c] for c in meta["centroids"]]


def test_frozen_pq_books_shape():
    books = load_frozen_pq_books()
    assert len(books) == 8  # m subspaces
    assert all(len(b) == 16 for b in books)  # n_codes
    assert all(len(cent) == 8 for b in books for cent in b)  # sub dim
    assert all(
        math.isfinite(x) for b in books for cent in b for x in cent
    )
    for b in books:  # per-subspace codebooks must not collapse
        assert len({tuple(c) for c in b}) == 16


def test_frozen_bpe_merges_shape_and_provenance():
    """The committed tokenizer store (q39z embeds these merges as
    literals in both engines): 20 well-formed merges, no duplicates
    (a duplicate merge would be a no-op replace — a corrupted file),
    no delimiter byte inside any symbol (the wrap trick depends on
    it), and the loader returns exactly the committed pairs."""
    from wing_binlog_go_spark.functions.text import load_frozen_bpe_merges

    merges = load_frozen_bpe_merges()
    assert len(merges) == 20
    assert len(set(merges)) == 20
    for a, b in merges:
        assert a and b and "\x1f" not in a and "\x1f" not in b
    meta = json.load(open(os.path.join(_RES, "bpe_merges_q39u.json")))
    assert meta["n_merges"] == 20 and meta["min_count"] == 2
    assert "sf0.01 documents" in meta["trained_on"]
    assert merges == [(a, b) for a, b in meta["merges"]]
    # later merges may consume earlier merges' output symbols, never
    # symbols that no earlier step can produce: every non-initial
    # symbol must be buildable
    buildable = {a + b for a, b in merges}
    for a, b in merges:
        for s in (a, b):
            assert len(s) == 1 or s == "</w>" or s in buildable, s
