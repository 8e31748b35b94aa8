"""MMT-TPU: a TPU-native multimodal long-transformer framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
googleinterns/multimodal-long-transformer-2021 ("MMT"): a BERT-style
multimodal encoder over a packed sequence of image patches + text
wordpieces with ETC-style relative attention (including the 2D relative
position scheme for image patches), pretraining (MLM + MPP + ITM),
ITM classification finetuning, and image-text retrieval evaluation.

Layer map (mirrors reference SURVEY.md section 1, re-designed TPU-first):

- ``mmt_tpu.configs``    typed config dataclasses + yaml override + registries
- ``mmt_tpu.features``   pure feature functions (relative ids, masks, patches,
                         masking, ITM mining) -- host numpy + on-device jnp
- ``mmt_tpu.text``       WordPiece tokenizer + round-robin trimmer
- ``mmt_tpu.data``       TFRecord IO + pretrain/classification/retrieval loaders
- ``mmt_tpu.models``     flax modules: encoder, relative transformer, heads
- ``mmt_tpu.ops``        compute kernels: dense reference + Pallas TPU kernels
- ``mmt_tpu.parallel``   device mesh / sharding (pjit over ICI+DCN)
- ``mmt_tpu.train``      optimizer, losses, metrics, tasks, train loop, ckpt
- ``mmt_tpu.eval``       batched retrieval prediction + Recall@K
- ``mmt_tpu.cli``        train/predict drivers
"""

__version__ = "0.1.0"
