"""``python -m waveunet_tpu`` == ``python -m waveunet_tpu.cli``."""

from waveunet_tpu.cli import main

if __name__ == "__main__":
    main()
