#!/usr/bin/env bash
# Test runner (reference pattern: MONAI runtests.sh --unittests/--disttests/--quick/--min).
#
#   ./runtests.sh --unittests   # full CPU unit suite on the 8-device virtual mesh
#   ./runtests.sh --quick       # skip slow integration tests
#   ./runtests.sh --disttests   # multi-process distributed harness only
#   ./runtests.sh --min         # fast import + smallest smoke subset
#   ./runtests.sh --bundles     # five BASELINE bundle configs end-to-end (slow)
set -e
cd "$(dirname "$0")"

# tests are CPU-only by design: strip any TPU plugin env and force an 8-device mesh
export JAX_PLATFORMS=cpu
export XLA_FLAGS="${XLA_FLAGS:-} --xla_force_host_platform_device_count=8"
export _MONAI_TPU_TEST_REEXEC=1
unset PALLAS_AXON_POOL_IPS

mode="${1:---unittests}"
case "$mode" in
  --unittests)
    python -m pytest tests/ -q --ignore=tests/test_bundles_baseline.py ;;
  --quick)
    python -m pytest tests/ -q -m "not slow" --ignore=tests/test_bundles_baseline.py \
        --ignore=tests/test_integration_segmentation.py ;;
  --disttests)
    python -m pytest tests/test_distributed_multiprocess.py tests/test_parallel.py \
        tests/test_tensor_parallel.py -q ;;
  --min)
    python -c "import monai_tpu; import monai_tpu.transforms, monai_tpu.data, monai_tpu.networks.nets, monai_tpu.losses, monai_tpu.metrics, monai_tpu.inferers, monai_tpu.engines, monai_tpu.handlers, monai_tpu.bundle; print('import OK')"
    python -m pytest tests/test_resample.py tests/test_transforms_spatial.py \
        tests/test_losses_metrics.py -q ;;
  --bundles)
    python -m pytest tests/test_bundles_baseline.py -q ;;
  *)
    echo "usage: $0 [--unittests|--quick|--disttests|--min|--bundles]"; exit 2 ;;
esac
