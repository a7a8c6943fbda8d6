"""torch.hub protocol shim (reference: hubconf.py, UNVERIFIED mount,
SURVEY.md §2 #20).

Makes ``torch.hub.load('<this repo>', 'unet_carvana', source='local'|'github')``
resolve exactly as the upstream repo does; the entry point itself lives in
``tpu_unet.hub`` and returns the JAX model tuple (params, state, config,
mask_values) instead of an nn.Module — the framework's native handle.
"""

dependencies = ["jax", "numpy"]

from tpu_unet.hub import unet_carvana  # noqa: E402,F401
from tpu_unet.hub import unet  # noqa: E402,F401
