#!/usr/bin/env bash
# Download all runtime assets (same public asset IDs as the reference repo's
# prepare/*.sh). Run from the repo root. Requires gdown + wget.
set -e

echo "== SMPL body model =="
mkdir -p body_models
( cd body_models && gdown "https://drive.google.com/uc?id=1INYlGA76ak_cKGzvpOV2Pe6RkYTlXTW2" \
  && unzip -o smpl.zip && rm smpl.zip )

echo "== GloVe vectors (evaluators) =="
gdown --fuzzy "https://drive.google.com/file/d/1cmXKUT31pqd7_XpJAiWEo1K81TMYHA5n/view?usp=sharing"
rm -rf glove && unzip glove.zip && rm glove.zip

echo "== T2M evaluator checkpoints =="
gdown --fuzzy "https://drive.google.com/file/d/1O_GUHgjDbl2tgbyfSwZOUYXDACnk25Kb/view"
gdown --fuzzy "https://drive.google.com/file/d/12liZW5iyvoybXD8eOw4VanTgsMtynCuU/view"
unzip -o t2m.zip && unzip -o kit.zip && rm t2m.zip kit.zip

echo "== a2m datasets (HumanAct12, UESTC) =="
mkdir -p dataset
( cd dataset \
  && gdown "https://drive.google.com/uc?id=1130gHSvNyJmii7f6pv5aY5IyQIWc3t7R" \
  && tar xfz HumanAct12Poses.tar.gz && rm HumanAct12Poses.tar.gz \
  && gdown "https://drive.google.com/uc?id=1LE-EmYNzECU8o7A2DmqDKtqDMucnSJsy" \
  && tar xjf uestc.tar.bz2 && rm uestc.tar.bz2 )

echo "== action-recognition classifiers =="
mkdir -p assets/actionrecognition
( cd assets/actionrecognition \
  && wget -q https://raw.githubusercontent.com/EricGuo5513/action-to-motion/master/model_file/action_recognition_model_humanact12.tar -O humanact12_gru.tar \
  && gdown "https://drive.google.com/uc?id=1bSSD69s1dHY7Uk0RGbGc6p7uhUxSDSBK" \
  && gdown "1xfigimkPxKt3a8zvn_ME_NAR6CyTqneK" )

echo "== CLIP BPE vocab (text tokenizer) =="
mkdir -p assets/text
wget -q https://raw.githubusercontent.com/openai/CLIP/main/clip/bpe_simple_vocab_16e6.txt.gz \
  -O assets/text/bpe_simple_vocab_16e6.txt.gz

cat <<'MSG'
Done. Remaining manual steps:
- HumanML3D / KIT-ML motion data: follow EricGuo5513/HumanML3D preprocessing
  into dataset/HumanML3D and dataset/KIT-ML.
- Text encoder weights: convert once with
    python -m mdm_tpu.cli.convert_text_encoders --clip <ViT-B-32.pt-or-HF-dir>
- Reference MDM checkpoints: convert with
    python -m mdm_tpu.cli.convert_checkpoint --torch_ckpt <model.pt> --out_dir <dir>
MSG
