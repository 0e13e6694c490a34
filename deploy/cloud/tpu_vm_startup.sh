#!/bin/bash
# Cloud TPU VM startup script: first boot provisions the environment; every
# subsequent boot resumes interrupted training runs.
#
# TPU-native counterpart of the reference's AWS EC2 spot-instance scripts
# (utils/aws/userdata.sh + mime.sh + resume.py): attach it as the TPU VM's
# --metadata startup-script so preemptible/spot TPU slices self-heal.
#   gcloud compute tpus tpu-vm create $NAME --zone=$ZONE \
#     --accelerator-type=v5litepod-8 --version=tpu-ubuntu2204-base \
#     --spot --metadata-from-file startup-script=deploy/cloud/tpu_vm_startup.sh
#
# Training resume is first-class in the trainer (orbax checkpoints restore
# params/optimizer/EMA/epoch — mmidet_tpu/train/checkpoint.py), so the
# restart path is just tools/resume_all.py over the runs directory.

set -u
cd /home/mmidet 2>/dev/null || { sudo mkdir -p /home/mmidet && cd /home/mmidet; }

# repo URL comes from instance metadata (startup scripts get no custom env):
#   gcloud ... --metadata mmidet-repo-url=https://github.com/you/mmidet_tpu
REPO_URL=$(curl -fs -H "Metadata-Flavor: Google" \
  "http://metadata.google.internal/computeMetadata/v1/instance/attributes/mmidet-repo-url" \
  || true)
if [ -z "${REPO_URL}" ]; then
  echo "mmidet-repo-url metadata missing; nothing to provision" >&2
  exit 0
fi

if [ ! -d mmidet_tpu_repo ]; then
  echo "First boot: provisioning."
  git clone "${REPO_URL}" mmidet_tpu_repo || { echo "clone failed" >&2; exit 1; }
  cd mmidet_tpu_repo
  python3 -m pip install --upgrade pip
  python3 -m pip install "jax[tpu]" \
    -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
  python3 -m pip install flax optax orbax-checkpoint einops pyyaml \
    opencv-python-headless pillow
  # native fast loader (threaded libjpeg decode + letterbox)
  bash native/build.sh || echo "fastloader build skipped (falls back to cv2)"
  echo "Provisioning done."
else
  echo "Restart: resuming interrupted runs."
  cd mmidet_tpu_repo
  # scans runs/*/ckpt for non-finalized checkpoints and relaunches training
  # with --resume (counterpart of utils/aws/resume.py)
  nohup python3 tools/resume_all.py runs >resume.log 2>&1 &
fi
