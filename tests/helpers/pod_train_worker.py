"""Worker for the 2-process pod CLI tests (tests/test_parallel.py).

Unlike pod_worker.py (library-level step test), this drives the REAL product
surface: a ``cli`` subcommand with the ``coordinator=/num_processes=/
process_id=`` options, under gloo CPU collectives — the one-command pod
paths (`/root/reference/Training.py:152-166` + SURVEY.md §C22/C23).

argv: <process_id> <num_processes> <port> <cli_argv_json>
  cli_argv_json: JSON list of CLI fragments STARTING WITH the subcommand
  (e.g. ["train", "baseline", ...] or ["evaluate", ...]).
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax  # noqa: E402

# The axon plugin ignores JAX_PLATFORMS env; only the config call sticks.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    args = json.loads(sys.argv[4])

    from waveunet_tpu import cli

    cli.main(args + [f"coordinator=127.0.0.1:{port}",
                     f"num_processes={nproc}",
                     f"process_id={pid}"])
    print(json.dumps({"pid": pid, "done": True}), flush=True)


if __name__ == "__main__":
    main()
