"""TPU-native continuous-time sequential recommendation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the EasyDGL
reference suite (see SURVEY.md): an 11-model zoo of sequential recommenders,
masked/autoregressive training objectives with TPP likelihood terms, and
full-catalog HR@k/NDCG@k evaluation — built for SPMD execution over TPU
device meshes.
"""
__version__ = "0.1.0"
