"""Convert a torchvision vgg19 (or vggface-named) .pth into flax msgpack
weights for training/perceptual.py:PerceptualLoss(arch='vgg19').

Usage: python scripts/convert_vgg.py vgg19.pth vgg19_flax.msgpack
Then:  PerceptualLoss(arch="vgg19", weights_path="vgg19_flax.msgpack")
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import torch
    from flax import serialization

    from genefaceplusplus_tpu.utils.convert_torch_ckpt import convert_vgg19

    src, dst = sys.argv[1], sys.argv[2]
    state = torch.load(src, map_location="cpu", weights_only=False)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    state = state.get("state_dict", state)
    variables = convert_vgg19({k: v.numpy() for k, v in state.items()
                               if hasattr(v, "numpy")})
    with open(dst, "wb") as f:
        f.write(serialization.msgpack_serialize(variables))
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
