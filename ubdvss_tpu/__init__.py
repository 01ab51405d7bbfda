"""ubdvss_tpu — TPU-native rebuild of asmekal/ubdvss.

"Universal Barcode Detector via Semantic Segmentation" (arXiv:1906.06281)
re-designed TPU-first in JAX/XLA/Pallas: fused on-device preprocessing,
dilated-context FCN, pixelwise CE with hard-negative mining, and on-device
heatmap postprocessing (connected components + min-area rectangles), with
mesh-sharded data parallelism and halo-exchanged tiled inference.

See SURVEY.md at the repo root for the blueprint and evidence status
(the reference mount was empty; parity is defined against the in-repo
Keras oracle in tests/oracle/).
"""

from ubdvss_tpu.net_config import NetConfig, DEFAULT_CLASS_NAMES, CLASS_GROUPS
from ubdvss_tpu.models.model import BarcodeFCN, get_model, init_params, param_count

__version__ = "0.1.0"

__all__ = [
    "NetConfig",
    "DEFAULT_CLASS_NAMES",
    "CLASS_GROUPS",
    "BarcodeFCN",
    "get_model",
    "init_params",
    "param_count",
]
