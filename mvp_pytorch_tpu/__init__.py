"""mvp_pytorch_tpu — TPU-native (JAX/XLA/Pallas/pjit) rebuild of MVPTR capabilities.

A brand-new vision-language pretraining + fine-tuning framework with the
capability surface of Junction4Nako/mvp_pytorch (MVPTR, ACM MM'22), designed
TPU-first: functional flax modules, pjit/shard_map device-mesh parallelism,
bf16 compute, Pallas kernels on the hot paths, and deterministic resumable
input pipelines.

Layer map (mirrors SURVEY.md §1, re-architected):
  models/    — config + the three-stream BiEncoder backbone, single-stream
               ImgBert, task heads, pretrain losses, generation.
  ops/       — Pallas/XLA compute kernels (fused attention, masked segment ops).
  parallel/  — meshes, sharding rules (ZeRO-equivalent state sharding),
               distributed eval gather.
  data/      — tokenizer, tensorization contract, masking, TSV storage,
               deterministic loaders.
  training/  — unified trainer, optax optimizers/schedules, checkpointing,
               metric loggers.
  tasks/     — CLI drivers: pretrain, retrieval (two-stage eval), VQA, VE, RE.
  utils/     — logging, misc, yaml config.
"""

__version__ = "0.1.0"
