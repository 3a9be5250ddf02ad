"""Model configuration.

One config dataclass replaces the reference's four overlapping config
mechanisms (SURVEY.md §5 "Config / flag system"): it is a superset of the
vendored BertConfig (reference `transformers/pytorch_transformers/modeling_bert.py:158`)
plus the image/phrase/contrastive fields the reference run scripts graft onto
the config at load time (reference `oscar/run_pretrain_ml.py:294-312`,
`oscar/run_retrieval.py:1031-1036`).

JSON round-trip is key-compatible with reference checkpoints' `config.json`
so converted checkpoints self-describe the same way.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, Optional


@dataclass
class ModelConfig:
    # --- BERT core (names match reference BertConfig JSON keys) ---
    vocab_size: int = 30522              # total embedding rows: wordpieces + phrase concepts
    hidden_size: int = 768
    num_hidden_layers: int = 12          # split 6/6/6 across txt/vis/mul encoders
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    initializer_range: float = 0.02
    layer_norm_eps: float = 1e-12

    # --- MVPTR vocabulary split ---
    # LM decoder ties to the first `only_word_size` embedding rows only
    # (reference `modeling_bert.py:494-516` BertLMPredictionHead(only_vocab),
    # `modeling_utils.py:275-288` _tie_or_clone_weights(only_vocab=...)).
    only_word_size: int = 30522

    # --- image stream ---
    img_feature_dim: int = 2054          # 2048 RoI + 6 box geometry
    img_feature_type: str = "faster_r-cnn"
    use_img_layernorm: bool = False
    img_layer_norm_eps: float = 1e-12

    # --- task/pretrain fields grafted by reference run scripts ---
    num_contrast_classes: int = 2        # ITM binary
    qa_answer_size: int = 0              # pretrain QA head rows (0 = no head)
    num_labels: int = 2                  # classification heads
    loss_type: str = "sfmx"              # sfmx | kl | bce (reference run_vqa/--loss_type)
    cls_hidden_scale: int = 2            # MLP classifier widening (reference modeling_vlbert.py:1730-1744)
    classifier: str = "linear"           # linear | mlp
    max_text_seq_length: Optional[int] = None

    # --- TPU-native knobs (new; no reference equivalent) ---
    dtype: str = "float32"               # computation dtype: float32 | bfloat16
    attention_impl: str = "auto"         # auto | xla | xla_blhd (pallas retired, see ops/attention.py)
    remat: bool = False                  # jax.checkpoint each encoder layer
    fused_hn_pass: bool = False          # run true+hard fusion as ONE 2B-row
                                         # mul_encoder call. A/B'd on chip at
                                         # B=96: LOSES ~3% (103.3/101.5 vs
                                         # 100.1/98.0 ms) — the gather+concat
                                         # copies cost more than the bigger
                                         # matmuls save; B=96 already tiles
                                         # the MXU. Kept as a knob for small-
                                         # batch regimes.

    # --- pipeline parallelism (new capability; reference has none) ---
    # >0 switches every StreamEncoder to the STACKED scan layout
    # ({'layers': {'layer': leaves[L, ...]}}) whose leading layer dim is
    # shardable over a `pipe` mesh axis; execution pipelines (GPipe) when a
    # parallel.pipeline.pipeline_scope is active, else runs an equivalent
    # sequential lax.scan. Saved in config.json so checkpoints self-describe
    # their param layout.
    pipeline_stages: int = 0

    # --- Mixture-of-Experts FFN (new capability; reference has none) ---
    moe_experts: int = 0                 # 0 = dense FFN everywhere
    moe_top_k: int = 2                   # experts per token (normalized gates)
    moe_capacity_factor: float = 1.25    # expert capacity multiplier
    moe_every: int = 2                   # every Nth layer's FFN is MoE
    moe_group_size: int = 1024           # tokens per dispatch group (GShard)

    def __post_init__(self):
        if self.hidden_size % self.num_attention_heads != 0:
            raise ValueError(
                f"hidden_size {self.hidden_size} not divisible by "
                f"num_attention_heads {self.num_attention_heads}")

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def half_layers(self) -> int:
        """Layers per stream encoder (reference modeling_vlbert.py:360-364)."""
        return self.num_hidden_layers // 2

    # --- (de)serialization, reference-checkpoint-compatible ---

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json_string(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True) + "\n"

    def save_pretrained(self, save_directory: str) -> None:
        os.makedirs(save_directory, exist_ok=True)
        with open(os.path.join(save_directory, "config.json"), "w") as f:
            f.write(self.to_json_string())

    @classmethod
    def from_dict(cls, d: dict, **overrides: Any) -> "ModelConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in d.items() if k in known}
        kwargs.update({k: v for k, v in overrides.items() if k in known})
        return cls(**kwargs)

    @classmethod
    def from_pretrained(cls, path: str, **overrides: Any) -> "ModelConfig":
        if os.path.isdir(path):
            path = os.path.join(path, "config.json")
        with open(path) as f:
            return cls.from_dict(json.load(f), **overrides)


def tiny_config(**overrides: Any) -> ModelConfig:
    """Tiny config for unit tests (mirrors the reference test mixin's
    vocab 99 / hidden 32 / 4 heads idea, reference
    `transformers/pytorch_transformers/tests/modeling_bert_test.py:33-61`)."""
    base = dict(
        vocab_size=131,
        only_word_size=99,
        hidden_size=32,
        num_hidden_layers=4,
        num_attention_heads=4,
        intermediate_size=37,
        max_position_embeddings=64,
        img_feature_dim=22,
        qa_answer_size=7,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    base.update(overrides)
    return ModelConfig(**base)
