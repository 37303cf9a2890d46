"""Property-based tests (hypothesis) for the pure-Python hot-path kernels.

These run WITHOUT a SparkSession: the winnowing pandas UDF's inner batch
function and the numpy PNG/PPM codec are plain functions, so hypothesis can
hammer them with hundreds of adversarial inputs cheaply — the guarantees
the distributed operators are built on get exercised far beyond the few
fixed fixtures the Spark-level tests use.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from aws_genaric_datapipeline_spark.operators.imagecodec import (
    decode_image,
    encode_png,
    encode_ppm,
    resize_nearest,
)
from aws_genaric_datapipeline_spark.operators.text import winnow_batch_fn

K, W = 25, 10
_WINNOW_BATCH = winnow_batch_fn(k=K, w=W)


def winnow(texts: list[str | None]) -> list[set[int]]:
    return [set(v) for v in _WINNOW_BATCH(pd.Series(texts, dtype=object))]


# Printable-ASCII docs; min length keeps the shared chunk ≥ w + k - 1.
_doc = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0,
    max_size=300,
)
_chunk = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=W + K - 1,
    max_size=120,
)


class TestWinnowProperties:
    @settings(max_examples=200, deadline=None)
    @given(prefix_a=_doc, prefix_b=_doc, shared=_chunk, suffix_a=_doc, suffix_b=_doc)
    def test_shared_substring_guarantees_shared_fingerprint(
        self, prefix_a, prefix_b, shared, suffix_a, suffix_b
    ):
        """Schleimer/Wilkerson/Aiken theorem 1: two documents sharing a
        substring of length >= w + k - 1 share at least one selected
        fingerprint, whatever surrounds it."""
        a = prefix_a + shared + suffix_a
        b = prefix_b + shared + suffix_b
        fa, fb = winnow([a, b])
        assert fa & fb, (a, b)

    @settings(max_examples=100, deadline=None)
    @given(doc=_doc)
    def test_batched_equals_single(self, doc):
        """Batching across documents must not change any document's
        fingerprints (the batch-level hash array is sliced per doc)."""
        alone = winnow([doc])[0]
        packed = winnow(["x" * 40, doc, None, "", "y" * 300])
        assert packed[1] == alone

    @settings(max_examples=100, deadline=None)
    @given(doc=st.text(min_size=1, max_size=200))
    def test_fingerprints_are_deterministic_and_nonempty(self, doc):
        f1, f2 = winnow([doc]), winnow([doc])
        assert f1 == f2
        assert f1[0], "non-empty doc must produce at least one fingerprint"

    @settings(max_examples=50, deadline=None)
    @given(docs=st.lists(_doc | st.none(), min_size=1, max_size=8))
    def test_multi_slab_equals_one_slab(self, docs):
        """The bounded-memory slab split must be invisible: a slab cap that
        forces one doc per slab yields the same fingerprints as the
        unbounded batch kernel."""
        import pandas as pd

        tiny = winnow_batch_fn(k=K, w=W, slab_chars=1)(pd.Series(docs)).tolist()
        big = winnow_batch_fn(k=K, w=W)(pd.Series(docs)).tolist()
        assert tiny == big


_img = st.integers(min_value=1, max_value=24).flatmap(
    lambda h: st.integers(min_value=1, max_value=24).flatmap(
        lambda w: st.binary(min_size=h * w * 3, max_size=h * w * 3).map(
            lambda raw: np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
        )
    )
)


class TestCodecProperties:
    @settings(max_examples=150, deadline=None)
    @given(img=_img)
    def test_png_roundtrip_lossless(self, img):
        assert np.array_equal(decode_image(encode_png(img)), img)

    @settings(max_examples=150, deadline=None)
    @given(img=_img)
    def test_ppm_roundtrip_lossless(self, img):
        assert np.array_equal(decode_image(encode_ppm(img)), img)

    @settings(max_examples=100, deadline=None)
    @given(img=_img, w=st.integers(1, 16), h=st.integers(1, 16))
    def test_resize_output_shape_and_palette(self, img, w, h):
        out = resize_nearest(img, w, h)
        assert out.shape == (h, w, 3)
        # nearest-neighbor introduces no new colors
        src = {tuple(p) for p in img.reshape(-1, 3)}
        assert {tuple(p) for p in out.reshape(-1, 3)} <= src


class TestAdaptiveSizingProperties:
    @given(n=st.integers(min_value=1, max_value=10**15))
    @settings(max_examples=200, deadline=None)
    def test_adaptive_planes_bounded_and_monotone_step(self, n):
        from aws_genaric_datapipeline_spark.operators.similarity import (
            LSH_MAX_PLANES,
            adaptive_num_planes,
        )

        p = adaptive_num_planes(n)
        assert 3 <= p <= LSH_MAX_PLANES
        # monotone: more data never means fewer planes
        assert adaptive_num_planes(n * 2) >= p
        # bucket-width invariant inside the unclamped band: expected width
        # N/2^p stays within [target/2, target] up to the ceil step
        target = 64
        if p not in (3, LSH_MAX_PLANES):
            assert n / (1 << p) <= target + 1e-9

    @given(n=st.integers(min_value=1, max_value=10**15))
    @settings(max_examples=200, deadline=None)
    def test_adaptive_cells_bounded_and_monotone(self, n):
        from aws_genaric_datapipeline_spark.operators.similarity import (
            adaptive_num_cells,
        )

        c = adaptive_num_cells(n)
        assert 4 <= c <= 1 << 18
        assert adaptive_num_cells(n * 2) >= c
        # power of two
        assert c & (c - 1) == 0


class TestContainmentDominatesJaccard:
    def test_every_jaccard_pair_appears_in_both_containment_directions(self, spark):
        """C(A→B) = |A∩B|/|A| >= |A∩B|/|A∪B| = J(A,B), so at the SAME
        threshold every Jaccard pair must surface as BOTH directional
        containment facts — the algebraic bridge between the symmetric
        and asymmetric near-dup operators, checked on real fixtures."""
        from aws_genaric_datapipeline_spark.operators import dedup as D
        from aws_genaric_datapipeline_spark.tables import load

        (documents,) = load(spark, "/root/testdata/sf0.001", "documents")
        jac = {
            (r["id_a"], r["id_b"])
            for r in D.jaccard_pairs(documents, n=3, threshold=0.5).collect()
        }
        cont = {
            (r["id_contained"], r["id_container"])
            for r in D.containment_pairs(documents, n=3, threshold=0.5).collect()
        }
        assert jac, "fixture must produce near-dup pairs"
        for a, b in jac:
            assert (a, b) in cont and (b, a) in cont, (a, b)
