"""SPMD parallelism: single-host meshes (:mod:`.mesh` — DP + Megatron TP),
GPipe pipeline parallelism (:mod:`.pipeline`), multi-host DCN data
parallelism (:mod:`.multihost`), and Megatron-TP training over the
fused kernels (:mod:`.tp_train`). Kept import-light — submodules import
lazily so ``import rajni_tpu`` never touches distributed state."""
