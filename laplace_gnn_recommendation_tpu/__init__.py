"""laplace_gnn_recommendation_tpu — a TPU-native graph recommender framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
dream-faster/laplace-gnn-recommendation (the reference lives at
/root/reference and is cited as ``file:line`` throughout the docstrings):

* **LightGCN** candidate generation: K-hop embedding diffusion over a sparse
  bipartite adjacency, BPR training, sharded top-k MIPS retrieval
  (reference: ``model/lightgcn.py``, ``run_pipeline_lightgcn.py``).
* **Heterogeneous SAGE encoder-decoder** ranking: per-user padded subgraph
  sampling, categorical feature embeddings, per-edge-type SAGE message
  passing, MLP edge decoder, BCE training, recall/precision/NDCG@k eval
  (reference: ``model/encoder_decoder.py``, ``data/dataset.py``).
* **PinSAGE** item-to-item retrieval: random-walk importance sampling,
  weighted SAGE convolutions, max-margin loss (reference: ``pinsage/``).
* ETL (MovieLens + H&M-style tabular→graph), chronological leave-last-2
  splitting, candidate matchers, HPO hooks, submission writer, metrics.

Everything on the compute path is functional JAX: static shapes, pytree
parameters, ``jax.jit``-compiled steps, shardings expressed with
``jax.sharding.Mesh`` + ``NamedSharding`` and Pallas kernels for the hot
gather/segment ops. The reference is single-device PyTorch; the parallelism
here (row-sharded embedding tables, sharded SpMM, sharded top-k MIPS, data
parallelism over user batches) is a new TPU-first design, not a port.
"""

__version__ = "0.1.0"

from . import constants, types  # noqa: F401
