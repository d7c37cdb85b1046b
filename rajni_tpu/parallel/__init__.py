"""SPMD parallelism: single-host meshes (:mod:`.mesh`) and multi-host
DCN data parallelism (:mod:`.multihost`). Kept import-light — submodules
import lazily so ``import rajni_tpu`` never touches distributed state."""
