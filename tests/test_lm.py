"""LM corpus pipeline + LM task: line index / token-length caches, lazy
reads, collate contract, Trainer-weighted perplexity, row masking."""
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hnet_mamba_asr_tpu.data.lm_text import (
    LMTextDataset, collate_lm, load_line_index, load_token_lengths,
    make_lm_dataloader,
)
from hnet_mamba_asr_tpu.data.tokenizer import Tokenizer
from hnet_mamba_asr_tpu.tasks.lm_task import LMModel, build_lm

LINES = ["the cat sat", "a dog ran", "", "  ", "hello world again",
         "the dog and the cat", "cc"]


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("lm")
    corpus = root / "corpus.txt"
    corpus.write_text("\n".join(LINES) + "\n")
    tok = Tokenizer.train([l for l in LINES if l.strip()] * 5, root / "bpe",
                          vocab_size=32, hard_vocab_limit=False)
    return corpus, tok


def test_line_index_skips_empty(setup):
    corpus, tok = setup
    offsets = load_line_index(corpus)
    assert len(offsets) == 5                           # blank lines skipped
    # cache file exists and is reused
    cache = corpus.with_suffix(".txt.idx.npz")
    assert cache.exists()
    again = load_line_index(corpus)
    np.testing.assert_array_equal(offsets, again)


def test_token_lengths_exact_and_cached(setup):
    corpus, tok = setup
    offsets = load_line_index(corpus)
    lens = load_token_lengths(corpus, tok, offsets)
    ds = LMTextDataset(tok, corpus_path=corpus)
    for i in range(len(ds)):
        assert lens[i] == len(tok.encode(ds._line(i)))
    # stale detection: touching the corpus rebuilds
    corpus.write_text("\n".join(LINES + ["new line here"]) + "\n")
    offsets2 = load_line_index(corpus)
    assert len(offsets2) == 6


def test_dataset_lazy_vs_memory(setup):
    corpus, tok = setup
    lazy = LMTextDataset(tok, corpus_path=corpus)
    mem = LMTextDataset(tok, lines=[l for l in corpus.read_text().splitlines()
                                    if l.strip()])
    assert len(lazy) == len(mem)
    for i in range(len(lazy)):
        np.testing.assert_array_equal(lazy[i]["tokens"], mem[i]["tokens"])
    with pytest.raises(ValueError, match="exactly one"):
        LMTextDataset(tok)


def test_max_tokens_cap(setup):
    corpus, tok = setup
    ds = LMTextDataset(tok, corpus_path=corpus, max_tokens=2)
    assert all(l <= 2 for l in ds.lengths)
    assert all(len(ds[i]["tokens"]) <= 2 for i in range(len(ds)))


def test_from_manifest(tmp_path, setup):
    _, tok = setup
    m = tmp_path / "dev.jsonl"
    m.write_text("\n".join(json.dumps({"id": f"u{i}", "text": t})
                           for i, t in enumerate(["the cat", "a dog"])))
    ds = LMTextDataset.from_manifest(m, tok)
    assert len(ds) == 2


def test_collate_contract(setup):
    corpus, tok = setup
    ds = LMTextDataset(tok, corpus_path=corpus)
    batch = collate_lm([ds[0], ds[1]], pad_id=tok.pad_id, batch_multiple=4)
    assert batch["tokens"].shape[0] == 4
    np.testing.assert_array_equal(batch["row_mask"], [True, True, False, False])
    assert batch["tokens"].shape[1] % 16 == 0
    assert (batch["tokens"][2] == tok.pad_id).all()


def test_lm_model_trainer_contract(setup):
    corpus, tok = setup
    model = build_lm({"lm_conf": {"d_model": 16, "n_layers": 1, "n_heads": 2,
                                  "d_ff": 32, "dropout": 0.0}}, tok.vocab_size)
    assert isinstance(model, LMModel)
    params = model.init_params(jax.random.PRNGKey(0))
    ds = LMTextDataset(tok, corpus_path=corpus)
    loader, _ = make_lm_dataloader(ds, batch_tokens=64, shuffle=False,
                                   batch_multiple=4)
    batch = next(iter(loader))
    batch.pop("ids")
    loss, stats = model.loss_fn(params, {k: jnp.asarray(v)
                                         for k, v in batch.items()}, 0, False)
    assert np.isfinite(float(loss))
    # batch_weight == scored tokens (+1 eos per real row)
    real = np.asarray(batch["row_mask"])
    expect = int((np.asarray(batch["token_lens"])[real] + 1).sum())
    assert int(stats["batch_weight"]) == expect
    assert 0.0 <= float(stats["lm/token_acc"]) <= 1.0


def test_lm_loss_row_mask_invariant(setup):
    """Garbage in a padded row must not change the LM loss."""
    corpus, tok = setup
    model = build_lm({"lm_conf": {"d_model": 16, "n_layers": 1, "n_heads": 2,
                                  "d_ff": 32, "dropout": 0.0}}, tok.vocab_size)
    params = model.init_params(jax.random.PRNGKey(0))
    tokens = np.full((4, 8), tok.pad_id, np.int32)
    tokens[0, :3] = [5, 6, 7]
    tokens[1, :2] = [8, 9]
    lens = np.array([3, 2, 0, 0], np.int32)
    mask = np.array([True, True, False, False])
    batch = {"tokens": jnp.asarray(tokens), "token_lens": jnp.asarray(lens),
             "row_mask": jnp.asarray(mask)}
    base, _ = model.loss_fn(params, batch, 0, False)
    tokens2 = tokens.copy()
    tokens2[3, :] = 11
    batch2 = dict(batch, tokens=jnp.asarray(tokens2))
    pert, _ = model.loss_fn(params, batch2, 0, False)
    assert float(base) == pytest.approx(float(pert), rel=1e-6)


def test_lm_row_shard_slices_assemble_to_global_batch():
    """LM multi-host row sharding: two ranks' local arrays concatenated in
    rank order equal the unsharded loader's padded global batch (same
    contract as the ASR loader; pad targets from the exact cached lengths)."""
    import numpy as np

    from hnet_mamba_asr_tpu.data.lm_text import LMTextDataset, make_lm_dataloader
    from hnet_mamba_asr_tpu.data.tokenizer import Tokenizer

    lines = [f"word{i} " * (1 + i % 7) for i in range(23)]
    tok = Tokenizer.train(lines, "/tmp/lm_rs_tok/bpe", vocab_size=16,
                          hard_vocab_limit=False)
    ds = LMTextDataset(tok, lines=lines)
    full, _ = make_lm_dataloader(ds, 64, shuffle=True, seed=3,
                                 batch_multiple=2)
    shards = [make_lm_dataloader(LMTextDataset(tok, lines=lines), 64,
                                 shuffle=True, seed=3, batch_multiple=2,
                                 num_replicas=2, rank=r, row_shard=True)[0]
              for r in range(2)]
    fb_list, s0, s1 = list(full), list(shards[0]), list(shards[1])
    assert len(fb_list) == len(s0) == len(s1) > 1
    for fb, b0, b1 in zip(fb_list, s0, s1):
        for key in ("tokens", "token_lens", "row_mask"):
            np.testing.assert_array_equal(
                np.concatenate([b0[key], b1[key]], axis=0), fb[key],
                err_msg=key)
        assert b0["ids"] + b1["ids"] == fb["ids"]
