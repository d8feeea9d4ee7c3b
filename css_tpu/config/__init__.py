from css_tpu.config.config import Config, load_config, dump_config

__all__ = ["Config", "load_config", "dump_config"]
