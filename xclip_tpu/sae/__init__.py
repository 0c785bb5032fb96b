from xclip_tpu.sae.losses import SAELossCfg, itemwise_losses, sae_loss  # noqa: F401
from xclip_tpu.sae.model import (  # noqa: F401
    SAECfg,
    constrain_decoder_unit_norm,
    sae_apply,
    sae_init,
    sae_params_to_state_dict,
    sae_state_dict_to_params,
)
from xclip_tpu.sae.naming import DiscoverThenName, decode_sae_config  # noqa: F401
from xclip_tpu.sae.pipeline import Pipeline  # noqa: F401
from xclip_tpu.sae.resampler import ActivationResampler, apply_parameter_updates  # noqa: F401
