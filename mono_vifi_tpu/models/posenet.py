"""PoseNet: ResNet18 encoder over two concatenated RGB frames + pose decoder.

Reference: networks/posenet.py. The encoder is a standard ResNet whose conv1
takes 6 channels (pretrained weights averaged across the duplicated input —
handled by the weight converter); the decoder squeezes the last feature map
and regresses 0.01-scaled (axisangle, translation) for 2 frames
(networks/posenet.py:96-137).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from mono_vifi_tpu.models.resnet import ResNetFeatures, num_ch_enc


class PoseEncoder(nn.Module):
    """ResNet encoder over channel-concatenated frame pairs."""

    num_layers: int = 18
    dtype: jnp.dtype | None = None

    @property
    def num_ch_enc(self) -> tuple[int, ...]:
        return num_ch_enc(self.num_layers)

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ResNetFeatures(self.num_layers, self.dtype, name="encoder")(x, train)


class PoseDecoder(nn.Module):
    """Regress (axisangle, translation) from the last encoder feature map.

    Reference networks/posenet.py:96-137 with num_input_features=1,
    num_frames_to_predict_for=2 (as the trainer constructs it,
    train.py:187-190). Returns two (B, 2, 1, 3) arrays.
    """

    num_frames_to_predict_for: int = 2
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, last_feature):
        x = nn.relu(nn.Conv(256, (1, 1), dtype=self.dtype, name="squeeze")(last_feature))
        x = nn.relu(
            nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="pose_0")(x)
        )
        x = nn.relu(
            nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="pose_1")(x)
        )
        x = nn.Conv(
            6 * self.num_frames_to_predict_for, (1, 1), dtype=self.dtype, name="pose_2"
        )(x)
        out = jnp.mean(x, axis=(1, 2))  # (B, 6*F)
        out = 0.01 * out.reshape(-1, self.num_frames_to_predict_for, 1, 6)
        return out[..., :3], out[..., 3:]
