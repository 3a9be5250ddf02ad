"""Greedy / beam generation parity vs the reference generate().

Drives the reference `CaptionPreTrainedModel.generate`
(oscar/modeling/modeling_utils.py:46-598) with a toy bigram LM subclass
and our `models/generation.py` scan-based decoders with the same bigram
table: sequences must match token for token (greedy incl. repetition
penalty; beam search incl. length penalty).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(not os.path.isdir("/root/reference"),
                                reason="reference repo not mounted")

B, V, L = 3, 12, 9
BOS, EOS, PAD, MASK = 0, 1, 2, 3


@pytest.fixture(scope="module")
def toy():
    from ref_import import setup_reference_imports
    setup_reference_imports()
    import torch
    from oscar.modeling.modeling_utils import CaptionPreTrainedModel
    from transformers.pytorch_transformers.modeling_bert import BertConfig

    rs = np.random.RandomState(1)
    W = rs.randn(V, V).astype(np.float32) * 1.5
    # greedy table: EOS suppressed — the argmax path loops, so the
    # forced-EOS-in-last-slot contract is what gets exercised
    W[:, EOS] -= 2.0
    W[:, BOS] -= 9.0   # never re-emit BOS
    W[:, MASK] -= 9.0
    # beam table: a reliable high-probability road to EOS (8 -> 9 -> EOS)
    W2 = W.copy()
    W2[8, 9] += 5.0
    W2[9, EOS] += 8.0

    cfg = BertConfig(vocab_size_or_config_json_file=V, hidden_size=8,
                     num_hidden_layers=1, num_attention_heads=1,
                     intermediate_size=8)

    class ToyLM(CaptionPreTrainedModel):
        def __init__(self, config, table):
            # skip BertPreTrainedModel weight init; just be an nn.Module
            import torch.nn as nn
            nn.Module.__init__(self)
            self.config = config
            self.table = table
            self.num_keep_best = 1   # generate() reads it (:282,400)
            self.od_labels_len = 0   # no tag suffix in the toy buffer

        def prepare_inputs_for_generation(self, input_ids, **kw):
            # the real captioning model feeds a buffer with a masked NEXT
            # slot (token_len = cur_len + 1, modeling_utils.py:296-308,
            # :424-437 asserts logits width == input width)
            import torch
            nxt = input_ids.new_full((input_ids.shape[0], 1), MASK)
            return {"input_ids": torch.cat([input_ids, nxt], dim=1)}

        def forward(self, input_ids, **kw):
            # position i emits the next-token distribution conditioned on
            # token i-1 — the same shift-by-one contract as our logits_fn
            import torch
            by = self.table[input_ids]
            return (torch.cat([torch.zeros_like(by[:, :1]), by[:, :-1]],
                              dim=1),)

        def get_output_embeddings(self):
            return True   # generate() only checks "has an LM head"

    return ToyLM, cfg, torch, W, W2


@pytest.mark.parametrize("rep", [1.0, 1.4])
def test_greedy_parity(toy, rep):
    import jax.numpy as jnp
    import torch

    from mvp_pytorch_tpu.models.generation import generate

    ToyLM, cfg, _torch, W, _W2 = toy
    model = ToyLM(cfg, torch.from_numpy(W))
    prompts = torch.full((B, 1), BOS, dtype=torch.long)
    with torch.no_grad():
        ref_seq = model.generate(
            input_ids=prompts, max_length=L, do_sample=False, num_beams=1,
            temperature=1.0, top_k=0, top_p=1.0, repetition_penalty=rep,
            bos_token_id=BOS, pad_token_id=PAD, eos_token_ids=[EOS],
            length_penalty=1.0, num_return_sequences=1)[0].squeeze(1).numpy()

    jW = jnp.asarray(W)

    def logits_fn(tokens):
        by = jW[tokens]
        return jnp.concatenate([jnp.zeros_like(by[:, :1]), by[:, :-1]], 1)

    out = generate(logits_fn, BOS, EOS, PAD, MASK, batch_size=B,
                   max_len=L, do_sample=False, repetition_penalty=rep)
    np.testing.assert_array_equal(np.asarray(out.sequences), ref_seq)


def test_beam_parity(toy):
    import jax.numpy as jnp
    import torch

    from mvp_pytorch_tpu.models.generation import beam_search

    ToyLM, cfg, _torch, _W, W = toy
    model = ToyLM(cfg, torch.from_numpy(W))
    prompts = torch.full((B, 1), BOS, dtype=torch.long)
    with torch.no_grad():
        ref_seq = model.generate(
            input_ids=prompts, max_length=L, do_sample=False, num_beams=3,
            temperature=1.0, top_k=0, top_p=1.0, repetition_penalty=1.0,
            bos_token_id=BOS, pad_token_id=PAD, eos_token_ids=[EOS],
            length_penalty=1.0, num_return_sequences=1)[0].squeeze(1).numpy()

    jW = jnp.asarray(W)

    def logits_fn(tokens):
        by = jW[tokens]
        return jnp.concatenate([jnp.zeros_like(by[:, :1]), by[:, :-1]], 1)

    seq, _scores = beam_search(logits_fn, BOS, EOS, PAD, MASK,
                               batch_size=B, max_len=L, num_beams=3,
                               length_penalty=1.0)
    np.testing.assert_array_equal(np.asarray(seq), ref_seq)


@pytest.mark.parametrize("case,lp", [
    ("never_finished", 1.0),   # forced-EOS finalize of all-alive beams
    ("early_eos", 0.2),        # lp<1 prefers the long (never-finished) beam
    ("early_eos", 3.0),        # lp>1 prefers early EOS
    ("mixed", 1.0),            # rows finishing at different lengths
    ("mixed", 2.0),            # divisor exponent decides the winner
])
def test_beam_finalize_parity(toy, case, lp):
    """The regimes the basic beam test never hits: never-finished beams
    (reference adds every final-step candidate as prefix + forced EOS,
    modeling_utils.py:510-513,593-595) and cross-length score ranking
    (divisor = prefix length, BeamHypotheses.add :653-665). Sequences AND
    scores must match."""
    import jax.numpy as jnp
    import torch

    from mvp_pytorch_tpu.models.generation import beam_search

    ToyLM, cfg, _torch, W, _W2 = toy
    Wx = W.copy()
    if case == "never_finished":
        Wx[:, EOS] -= 50.0
    elif case == "early_eos":
        Wx[8, 9] += 5.0
        Wx[9, EOS] += 3.0
    else:  # mixed
        Wx[4, EOS] += 6.0
        Wx[8, 9] += 5.0
        Wx[9, EOS] += 8.0

    model = ToyLM(cfg, torch.from_numpy(Wx))
    prompts = torch.full((B, 1), BOS, dtype=torch.long)
    with torch.no_grad():
        ref_seq, ref_logp = model.generate(
            input_ids=prompts, max_length=L, do_sample=False, num_beams=3,
            temperature=1.0, top_k=0, top_p=1.0, repetition_penalty=1.0,
            bos_token_id=BOS, pad_token_id=PAD, eos_token_ids=[EOS],
            length_penalty=lp, num_return_sequences=1)
    ref_seq = ref_seq.squeeze(1).numpy()
    ref_logp = ref_logp.squeeze(1).numpy()

    jW = jnp.asarray(Wx)

    def logits_fn(tokens):
        by = jW[tokens]
        return jnp.concatenate([jnp.zeros_like(by[:, :1]), by[:, :-1]], 1)

    seq, scores = beam_search(logits_fn, BOS, EOS, PAD, MASK,
                              batch_size=B, max_len=L, num_beams=3,
                              length_penalty=lp)
    np.testing.assert_array_equal(np.asarray(seq), ref_seq)
    np.testing.assert_allclose(np.asarray(scores), ref_logp, atol=1e-5)
