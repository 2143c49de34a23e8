"""Convert a torchvision vgg19 / vgg_face_dag .pth into flax msgpack
weights for training/perceptual.py:PerceptualLoss(arch='vgg19').

Usage:
  python scripts/convert_vgg.py vgg19.pth vgg19_flax.msgpack
  python scripts/convert_vgg.py vgg_face_dag.pth vggface_flax.msgpack --face
Then:
  PerceptualLoss(arch="vgg19", weights_path="vgg19_flax.msgpack",
                 vggface_weights_path="vggface_flax.msgpack")
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import torch
    from flax import serialization

    from genefaceplusplus_tpu.utils.convert_torch_ckpt import (
        convert_vgg19,
        convert_vggface,
    )

    src, dst = sys.argv[1], sys.argv[2]
    convert = convert_vggface if "--face" in sys.argv[3:] else convert_vgg19
    state = torch.load(src, map_location="cpu", weights_only=False)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    state = state.get("state_dict", state)
    variables = convert({k: v.numpy() for k, v in state.items()
                         if hasattr(v, "numpy")})
    with open(dst, "wb") as f:
        f.write(serialization.msgpack_serialize(variables))
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
