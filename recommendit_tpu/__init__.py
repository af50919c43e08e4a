"""recommendit_tpu — a TPU-native two-stage recommender framework.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of the
reference two-stage recommender (Two-Tower retrieval + learning-to-rank
re-ranking over MovieLens-style data): pure-functional models, fused Pallas
kernels for the in-batch BPR loss and blocked MIPS top-k retrieval, sharded
embedding tables and corpus over a ``jax.sharding.Mesh``, and a serving path
where embed → retrieve → featurize → rank is a single jitted device call.
"""

__version__ = "0.1.0"

from recommendit_tpu.config import Settings, settings  # noqa: F401
