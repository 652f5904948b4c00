"""Reading-order / layout tests (SURVEY §2.4 L1–L3, §5.2 item 2).

The bubble-sort oracle here is transcribed *semantically* from
``core/pipelines/postprocessor/simple.py:62-101`` — the comparator is
non-transitive, so equivalence with any ``sorted(key=…)`` is NOT
assumed; we assert our implementation against the literal algorithm on
adversarial box sets (jitter straddling the 0.6·median threshold).
"""

import math
import random

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_document_recognition_service_spark import layout


def _bubble_oracle(quads, y_thresh=0.6):
    """Literal transcription of the reference algorithm semantics."""
    straight = layout.deskew(quads)
    heights = [layout._height(q) for q in straight]
    med = sorted(heights)[len(heights) // 2] if len(heights) % 2 else (
        sorted(heights)[len(heights) // 2 - 1] + sorted(heights)[len(heights) // 2]
    ) / 2.0
    thr = y_thresh * med
    pairs = sorted(
        list(enumerate(straight)), key=lambda p: layout._center(p[1])[0]
    )
    n = len(pairs) - 1
    swapped = True
    while swapped:
        swapped = False
        for i in range(n):
            (_, a), (_, b) = pairs[i], pairs[i + 1]
            ax, ay = layout._center(a)
            bx, by = layout._center(b)
            out = ay > by if abs(ay - by) > thr else ax > bx
            if out:
                pairs[i], pairs[i + 1] = pairs[i + 1], pairs[i]
                swapped = True
    return [i for i, _ in pairs]


def _rect(x, y, w=60, h=12):
    return layout.axis_rect(x, y, w, h)


def test_canonical_corners():
    q = [(10, 0), (0, 0), (0, 5), (10, 5)]
    assert layout.canonical_corners(q) == [(0, 0), (10, 0), (10, 5), (0, 5)]


def test_simple_two_rows_left_to_right():
    quads = [_rect(200, 10), _rect(10, 40), _rect(10, 10), _rect(200, 40)]
    assert layout.reading_order(quads) == [2, 0, 1, 3]


def test_jitter_below_threshold_same_row():
    # heights 12 → threshold 7.2; |Δy| = 5 keeps same row → order by x
    quads = [_rect(200, 15), _rect(10, 10)]
    assert layout.reading_order(quads) == [1, 0]


def test_jitter_above_threshold_splits_rows():
    # |Δy| = 10 > 7.2 → order by y regardless of x
    quads = [_rect(10, 20), _rect(200, 10)]
    assert layout.reading_order(quads) == [1, 0]


def test_deskew_recovers_rotated_rows():
    angle = 0.12
    ca, sa = math.cos(angle), math.sin(angle)
    cx, cy = 300, 400

    def rot(q):
        return [
            (ca * (x - cx) - sa * (y - cy) + cx, sa * (x - cx) + ca * (y - cy) + cy)
            for x, y in q
        ]

    base = [_rect(10, 10), _rect(200, 10), _rect(10, 40), _rect(200, 40)]
    rotated = [rot(q) for q in base]
    assert layout.reading_order(rotated) == [0, 1, 2, 3]


def test_matches_bubble_oracle_adversarial_threshold_straddle():
    rng = random.Random(7)
    for _ in range(200):
        n = rng.randint(1, 12)
        quads = []
        for _ in range(n):
            x = rng.uniform(0, 500)
            # y jitter straddles the 0.6·median(height)=7.2 boundary
            y = rng.choice([10, 16, 17, 18, 24, 40]) + rng.uniform(-1, 1)
            quads.append(_rect(x, y, w=rng.uniform(30, 90), h=12))
        assert layout.reading_order(quads) == _bubble_oracle(quads)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(0, 500, allow_nan=False),
            st.floats(0, 800, allow_nan=False),
            st.floats(5, 100, allow_nan=False),
            st.floats(5, 30, allow_nan=False),
        ),
        min_size=1,
        max_size=15,
    )
)
def test_matches_bubble_oracle_property(boxes):
    quads = [_rect(x, y, w, h) for x, y, w, h in boxes]
    assert layout.reading_order(quads) == _bubble_oracle(quads)
