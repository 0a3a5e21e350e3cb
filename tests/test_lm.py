"""Bigram LM training / perplexity scoring / DSIR weights (ops/lm.py).

The uncapped paths are oracle-checked bit-exactly against DuckDB by
tests/test_driver_contract.py (registry entries ``lm_perplexity`` and
``dsir_weights``); here we pin the closed-form math on a hand-computable
fixture and the capped-vocabulary semantics the registry doesn't reach.
"""

import math

import numpy as np
import pyarrow as pa
import ray.data as rd

from bitfunnel_ray.ops import lm


def _corpus(texts, langs=None):
    n = len(texts)
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(n)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs or ["en"] * n, pa.string()),
            }
        )
    )


def test_perplexity_closed_form():
    # corpus: "a b a b" and "a b c".  vocab = {a,b,c} -> V=3
    # bigram counts: (a b)=3, (b a)=1, (b c)=1; uni: a=3, b=3, c=1
    c = _corpus(["a b a b", "a b c"])
    model = lm.train_bigram_lm(c)
    assert model.vocab_v == 3
    out = (
        lm.perplexity_scores(c, model)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    lp_ab = math.log((3 + 1) / (3 + 3))  # p(b|a)
    lp_ba = math.log((1 + 1) / (3 + 3))  # p(a|b)
    lp_bc = math.log((1 + 1) / (3 + 3))  # p(c|b)
    exp0 = round((lp_ab + lp_ba + lp_ab) / 3, 6)
    exp1 = round((lp_ab + lp_bc) / 2, 6)
    assert out["n_bigrams"].tolist() == [3, 2]
    assert out["avg_logprob"].tolist() == [exp0, exp1]


def test_perplexity_short_docs_zero():
    c = _corpus(["solo", ""])
    model = lm.train_bigram_lm(c)
    out = lm.perplexity_scores(c, model).to_pandas().sort_values("doc_id")
    assert out["n_bigrams"].tolist() == [0, 0]
    assert out["avg_logprob"].tolist() == [0.0, 0.0]


def test_capped_vocab_folds_oov_to_unk():
    # "x" appears 5x, "y" 3x, "z" 1x; cap at 2 -> vocab {x,y}, z -> <unk>
    c = _corpus(["x y x y x", "x x y z"])
    model = lm.train_bigram_lm(c, vocab_size=2)
    assert model.vocab_v == 3  # x, y, <unk>
    # unigram mass is preserved: sum of counts == total tokens
    assert int(model.uni_cnt.sum()) == 9
    # <unk> carries z's count
    from bitfunnel_ray.stages.tokenize import hash_token_array

    unk = hash_token_array(pa.array(["<unk>"]))[0]
    i = int(np.searchsorted(model.uni_keys, unk))
    assert model.uni_keys[i] == unk and model.uni_cnt[i] == 1
    # bigram "y z" was counted as "y <unk>"
    yz = hash_token_array(pa.array(["y <unk>"]))[0]
    j = int(np.searchsorted(model.big_keys, yz))
    assert model.big_keys[j] == yz and model.big_cnt[j] == 1
    # capped scoring runs and treats z as <unk> (same score as literal <unk>)
    s1 = lm.perplexity_scores(_corpus(["x z"]), model).to_pandas()["avg_logprob"][0]
    s2 = lm.perplexity_scores(_corpus(["x <unk>"]), model).to_pandas()["avg_logprob"][0]
    assert s1 == s2


def test_min_count_prunes_bigram_rows():
    c = _corpus(["a b a b", "a b c"])
    full = lm.train_bigram_lm(c)
    pruned = lm.train_bigram_lm(c, min_count=2)
    assert len(pruned.big_keys) < len(full.big_keys)
    assert (pruned.big_cnt >= 2).all()


def test_dsir_weights_sign():
    # target = en docs; a token exclusive to en docs must get a positive
    # weight contribution, one exclusive to the other lang negative.
    c = _corpus(["good tokens here", "spammy junk here"], langs=["en", "xx"])

    def only_en(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.equal(t["lang"], "en"))

    target = c.map_batches(only_en, batch_format="pyarrow")
    out = lm.dsir_weights(c, target).to_pandas().sort_values("doc_id")
    assert out["log_weight"].tolist()[0] > out["log_weight"].tolist()[1]
    assert out["n_tokens"].tolist() == [3, 3]
