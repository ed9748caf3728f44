from dwcgan_tpu.losses.gmm import gmm_kl, gmm_emd  # noqa: F401
from dwcgan_tpu.losses.gan import (  # noqa: F401
    adversarial_d_loss, adversarial_g_loss, classification_loss,
    dis_loss, gen_adv_loss, recon_l1, diversity_loss,
    r1_penalty, gradient_penalty,
)
