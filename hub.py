"""Hub entry point at the repo root (reference hubconf.py convention).

The implementation lives in the installable package: `icafusion_tpu.hub`.

    import hub                      # repo checkout
    import icafusion_tpu.hub as hub # installed package
    model, variables = hub.create("icafusion_s", nc=3)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from icafusion_tpu.hub import create, list_models, pipeline  # noqa: E402,F401
