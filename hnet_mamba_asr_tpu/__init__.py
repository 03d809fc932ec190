"""TPU-native H-Net Mamba ASR framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of
anshulk-cmu/H-Net-Mamba-ASR (reference layout documented in /root/repo/SURVEY.md):
interpretable hierarchical speech recognition with a Mamba-2 encoder, H-Net dynamic
chunking, hybrid CTC+attention training on a data-parallel device mesh, a 7-cell
decode matrix with external-LM fusion/rescoring, statistical WER scoring with a
go/no-go gate, analytic efficiency accounting, and an interpretability suite.

Subpackages
-----------
- ``ops``       jittable compute primitives (SSD scan, CTC loss, EMA dechunk, log-mel, SpecAugment)
- ``models``    flax modules (Mamba-2 blocks, H-Net chunkers, encoder, CTC/AED heads, Transformer LM)
- ``parallel``  device-mesh / sharding helpers (pjit data parallel over ICI)
- ``data``      host-side pipeline (audio IO, BPE tokenizer, manifests, bucketed batching)
- ``training``  pjit trainer, optax factories, hybrid loss, checkpointing
- ``decoders``  search (CTC greedy/prefix-beam, joint CTC+AED beam, LM fusion/rescoring)
- ``tasks``     config -> wired objects (the only seam between YAML and Python)
- ``eval``      WER/CER metrics, bootstrap scoring + gate, analytic params/FLOPs
- ``interp``    boundary alignment, probes, robustness, emergence
- ``utils``     config/logging/metrics/provenance infrastructure
"""

__version__ = "0.1.0"
