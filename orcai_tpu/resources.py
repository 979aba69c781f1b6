"""Package data locations (defaults, bundled models)."""

from pathlib import Path

PKG_ROOT = Path(__file__).parent
DEFAULTS_DIR = PKG_ROOT / "defaults"
DEFAULT_ORCAI_PARAMETER = DEFAULTS_DIR / "default_orcai_parameter.json"
DEFAULT_HPS_PARAMETER = DEFAULTS_DIR / "default_hps_parameter.json"
DEFAULT_CALL_DURATION_LIMITS = DEFAULTS_DIR / "default_call_duration_limits.json"
MODELS_DATA_DIR = PKG_ROOT / "models_data"
