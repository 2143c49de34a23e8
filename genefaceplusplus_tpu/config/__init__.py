from genefaceplusplus_tpu.config.config import (
    Config,
    load_config,
    set_hparams,
    save_config,
)

__all__ = ["Config", "load_config", "set_hparams", "save_config"]
