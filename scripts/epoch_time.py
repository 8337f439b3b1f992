"""Native-res training epoch timing: conv_impl='xla' vs 'pair' (VJP path).

VERDICT r3 item 5: the pair-view conv kernel shipped with a custom VJP so
training shares the MXU win; this measures it. One TPU claim, both arms.

Each arm runs the canonical BM-1 config (31M params, GroupNorm(32)/ReLU,
bf16 compute, batch 1, remat on) on the real augmented DRIVE dataset for
`EPOCHS` epochs via the device-resident epoch scan (the shipping training
path), reporting steady-state s/epoch and final train loss so the loss
trajectories can be compared.

Usage: python scripts/epoch_time.py [epochs=3]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
DATA = os.environ.get("EPOCH_DATA", "/root/repo/_runs/augmented_data")


def run_arm(conv_impl: str) -> None:
    from unet_research_tpu.cli import training

    out = f"/tmp/epoch_time_{conv_impl}"
    t0 = time.perf_counter()
    training.main([
        "-mode", "train",
        "-data_path", DATA,
        "-save_path", out,
        "-num_epochs", str(EPOCHS),
        "-seed", "1234",
        "-conv_impl", conv_impl,
        "--precision", "bf16",
        "--auto_lr_find", "False",
    ])
    print(f"[epoch_time] arm={conv_impl} total={time.perf_counter() - t0:.1f}s",
          flush=True)


def main():
    for conv_impl in ("xla", "pair"):
        run_arm(conv_impl)


if __name__ == "__main__":
    main()
