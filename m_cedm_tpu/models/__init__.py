from m_cedm_tpu.models.adm_unet import AdmUNet, AdmUNetConfig
from m_cedm_tpu.models.ddpm_unet import DdpmUNet, DdpmUNetConfig


def build_backbone(hparams):
    """Select the backbone by name prefix, as the reference does
    (models/mcedm.py:36-39: `adm*` -> DhariwalUNet, else -> Model)."""
    name = hparams["name"]
    if name.startswith("adm"):
        cfg = AdmUNetConfig.from_hparams(hparams)
        return AdmUNet(cfg), cfg
    cfg = DdpmUNetConfig.from_hparams(hparams)
    return DdpmUNet(cfg), cfg
