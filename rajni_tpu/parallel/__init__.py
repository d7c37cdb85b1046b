"""SPMD parallelism: single-host meshes (:mod:`.mesh` — DP + Megatron TP),
GPipe pipeline parallelism (:mod:`.pipeline`), and multi-host DCN data
parallelism (:mod:`.multihost`). Kept import-light — submodules import
lazily so ``import rajni_tpu`` never touches distributed state."""
