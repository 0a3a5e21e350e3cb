"""Topic assignment + vocabulary coverage (ops/topics.py)."""

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from bitfunnel_ray.ops.topics import assign_topics, vocab_coverage

CATS = {"fruit": ("apple", "banana"), "animal": ("cat", "dog")}


def _docs():
    return pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "apple banana apple keyboard",   # fruit 3
                    "cat dog cat dog cat",            # animal 5
                    "keyboard mouse screen",          # other
                    "apple cat",                      # tie 1-1 → animal (name asc)
                    "",                               # empty → other
                ]
            ),
        }
    )


def test_assign_topics(ray_session):
    out = {r["doc_id"]: (r["topic"], r["hits"])
           for r in assign_topics(rd.from_arrow(_docs()), CATS).take_all()}
    assert out == {
        0: ("fruit", 3),
        1: ("animal", 5),
        2: ("other", 0),
        3: ("animal", 1),
        4: ("other", 0),
    }


def test_vocab_coverage(ray_session):
    ref = ray.put(np.asarray(["apple", "banana", "cat"], dtype=object))
    out = {r["doc_id"]: (r["n_tokens"], r["n_oov"], r["coverage"])
           for r in vocab_coverage(rd.from_arrow(_docs()), ref).take_all()}
    assert out[0] == (4, 1, 0.75)        # keyboard OOV
    assert out[1] == (5, 2, 0.6)         # two dogs OOV
    assert out[2] == (3, 3, 0.0)
    assert out[3] == (2, 0, 1.0)
    assert out[4] == (0, 0, 1.0)         # empty doc: nothing OOV
