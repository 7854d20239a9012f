from ivosw_tpu.core.config import Config, load_config, default_config

__all__ = ["Config", "load_config", "default_config"]
