"""Convert frozen text-encoder weights (torch) to Flax/orbax assets.

CLIP: accepts either an OpenAI clip checkpoint (`ViT-B-32.pt`, jit archive
or state dict) or a HuggingFace CLIPTextModelWithProjection directory.
DistilBERT: a HuggingFace DistilBertModel directory or .bin.

Outputs orbax param trees under assets/text/ consumed by
`mdm_tpu.sampling.text.make_text_embedder`.
"""
from __future__ import annotations

import argparse
import os


def convert_clip(src: str, out_dir: str):
    import orbax.checkpoint as ocp
    import torch

    from ..models.text_encoders import convert_hf_clip_text, convert_openai_clip_text

    if os.path.isdir(src):  # HF directory
        import glob

        bins = glob.glob(os.path.join(src, "*.bin")) + glob.glob(
            os.path.join(src, "*.safetensors")
        )
        sd = torch.load(bins[0], map_location="cpu", weights_only=False)
        params = convert_hf_clip_text({k: v.numpy() for k, v in sd.items()})
    else:
        obj = torch.jit.load(src, map_location="cpu") if src.endswith(".pt") else None
        sd = (obj.state_dict() if obj is not None else torch.load(src, map_location="cpu"))
        sd = {k: v.float().numpy() for k, v in sd.items() if not k.startswith("visual.")}
        params = convert_openai_clip_text(sd)
    path = os.path.abspath(os.path.join(out_dir, "clip_text_flax"))
    ocp.PyTreeCheckpointer().save(path, params)
    print(f"saved {path}")


def convert_bert(src: str, out_dir: str):
    import orbax.checkpoint as ocp
    import torch

    from ..models.text_encoders import convert_hf_distilbert

    if os.path.isdir(src):
        import glob

        bins = glob.glob(os.path.join(src, "*.bin"))
        sd = torch.load(bins[0], map_location="cpu", weights_only=False)
    else:
        sd = torch.load(src, map_location="cpu", weights_only=False)
    params = convert_hf_distilbert({k: v.numpy() for k, v in sd.items()})
    path = os.path.abspath(os.path.join(out_dir, "distilbert_flax"))
    ocp.PyTreeCheckpointer().save(path, params)
    print(f"saved {path}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--clip", default="", help="OpenAI clip .pt or HF dir")
    p.add_argument("--bert", default="", help="HF DistilBERT dir or .bin")
    p.add_argument("--out_dir", default="assets/text")
    args = p.parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)
    if args.clip:
        convert_clip(args.clip, args.out_dir)
    if args.bert:
        convert_bert(args.bert, args.out_dir)


if __name__ == "__main__":
    main()
