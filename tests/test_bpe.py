"""BPE tokenizer (stages/bpe.py): classic-example merges, naive-trainer
parity, encode==training-segmentation invariant, distributed encode
roundtrip, OOV determinism, guards, YAML parity."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from opentelemetry_collector_ray.stages.bpe import (
    END_OF_WORD, BPEModel, bpe_encode, bpe_tokenize, bpe_train,
    encode_word, train_merges, _word_symbols)


def _naive_train(word_counts: dict[str, int], num_merges: int):
    """Independent from-scratch reference: recount every pair each step.
    Returns (merges, final segmentation per word)."""
    words = {w: list(_word_symbols(w)) for w in word_counts if w}
    merges = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, sym in words.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + word_counts[w]
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        if pairs[best] < 2:
            break
        merges.append(best)
        for w, sym in words.items():
            out, i = [], 0
            while i < len(sym):
                if (i + 1 < len(sym)
                        and (sym[i], sym[i + 1]) == best):
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            words[w] = out
    return merges, words


def test_classic_sennrich_merges():
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_merges(wc, 3)
    # ('e','s') and ('s','t▁') both count 9 -> lexical tie-break
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t" + END_OF_WORD)
    assert merges[2] == ("l", "o")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_incremental_matches_naive(seed):
    rng = np.random.default_rng(seed)
    alphabet = "abcde"
    words = {"".join(rng.choice(list(alphabet),
                                rng.integers(1, 8))): int(c)
             for c in rng.integers(1, 9, 40)}
    fast = train_merges(words, 25)
    naive_merges, naive_seg = _naive_train(words, 25)
    assert fast == naive_merges
    # encode with learned ranks reproduces the training segmentation
    ranks = {m: i for i, m in enumerate(fast)}
    for w, seg in naive_seg.items():
        assert encode_word(w, ranks) == seg, w


def test_distributed_encode_roundtrip(ray_session):
    docs = ["the cat sat on the mat",
            "the dog sat on the log",
            "cats and dogs and cats",
            "", "THE CAT!!!"]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    ds = ray.data.from_arrow(t).repartition(3)
    model = bpe_train(ds, num_merges=20)
    id_to_tok = {i: s for s, i in model.token_to_id.items()}

    for conc in (None, 2):
        out = bpe_encode(ds, model, concurrency=conc,
                         batch_size=2).to_pandas()
        out = out.sort_values("doc_id").reset_index(drop=True)
        for did, ids, n in out.itertuples(index=False):
            assert n == len(ids)
            text = docs[did].lower()
            expect = "".join(c for c in text if c.isalpha())
            got = "".join(id_to_tok[i] for i in ids)
            assert got.replace(END_OF_WORD, "") == expect, did


def test_oov_encodes_to_unk_deterministically(ray_session):
    model = BPEModel([("a", "b")], alphabet=("a", "b",
                                             "b" + END_OF_WORD))
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["abz xb", "abz xb"])})
    out = bpe_encode(ray.data.from_arrow(t).repartition(2), model,
                     concurrency=2, batch_size=1).to_pandas()
    a, b = out.sort_values("doc_id")["token_ids"].tolist()
    assert list(a) == list(b)  # same text -> same ids on every actor
    assert model.unk_id in set(a)  # 'z'/'x' are out of vocabulary


def test_train_guard(ray_session):
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["many distinct words in here"])})
    with pytest.raises(ValueError, match="word types"):
        bpe_train(ray.data.from_arrow(t), max_word_types=2)


def test_bpe_yaml_parity(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from opentelemetry_collector_ray.config import PipelineConfig
    from opentelemetry_collector_ray.pipelines.builder import build_dataset

    p = tmp_path / "docs.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["aa bb aa", "bb cc aa"])}), str(p))
    y = build_dataset(PipelineConfig.from_dict({
        "receivers": {"parquet": {"paths": str(p)}},
        "processors": {"bpe": {"num_merges": 5}},
        "exporters": {"debug": {}},
        "service": {"pipelines": {"logs": {
            "receivers": ["parquet"], "processors": ["bpe"],
            "exporters": ["debug"]}}},
    })).to_pandas()
    direct = bpe_tokenize(
        lambda: ray.data.read_parquet(str(p)), num_merges=5).to_pandas()
    ykey = y.sort_values("doc_id").reset_index(drop=True)
    dkey = direct.sort_values("doc_id").reset_index(drop=True)
    assert ykey["n_bpe_tokens"].tolist() == dkey["n_bpe_tokens"].tolist()
    assert [list(x) for x in ykey["token_ids"]] == \
        [list(x) for x in dkey["token_ids"]]


def test_model_save_load_roundtrip(ray_session, tmp_path):
    from opentelemetry_collector_ray.stages.bpe import (
        load_model, save_model)

    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["the cat sat", "the dog sat"])})
    ds = ray.data.from_arrow(t)
    model = bpe_train(ds, num_merges=10)
    p = str(tmp_path / "bpe.json")
    save_model(model, p)
    back = load_model(p)
    assert back.merges == model.merges
    assert back.token_to_id == model.token_to_id
    a = bpe_encode(ds, model).to_pandas().sort_values("doc_id")
    b = bpe_encode(ds, back).to_pandas().sort_values("doc_id")
    assert [list(x) for x in a["token_ids"]] == \
        [list(x) for x in b["token_ids"]]


def test_bpe_decode_reconstructs_normalized_text(ray_session):
    """decode(encode(x)) == normalized word sequence when the model was
    trained on the same corpus (nothing maps to UNK)."""
    import pyarrow as pa
    import ray.data

    from opentelemetry_collector_ray.stages.bpe import (
        bpe_decode, bpe_encode, bpe_train)

    texts = ["The cat sat, and the cat ran!", "banana bandana",
             "", "123 !!", "aaa aaa bbb"]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts)})
    make = lambda: ray.data.from_arrow(tbl).repartition(2)
    model = bpe_train(make(), num_merges=50)
    out = bpe_decode(bpe_encode(make(), model), model) \
        .to_pandas().sort_values("doc_id")
    import re
    want = [" ".join(re.findall("[a-z]+", s.lower())) for s in texts]
    assert out["detok"].tolist() == want


def test_bpe_decode_unk_is_visible(ray_session):
    """Ids outside the training vocab decode to U+FFFD, never silently
    to some other token."""
    import pyarrow as pa
    import ray.data

    from opentelemetry_collector_ray.stages.bpe import (
        bpe_decode, bpe_encode, bpe_train)

    make_train = lambda: ray.data.from_arrow(
        pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array(["aaa bbb"])}))
    model = bpe_train(make_train(), num_merges=0)
    # encode text containing a symbol absent from the alphabet
    enc = bpe_encode(ray.data.from_arrow(
        pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array(["aaz"])})), model)
    out = bpe_decode(enc, model).to_pandas()
    assert "�" in out["detok"].iloc[0]
