"""Repo-root entry point: ``python main.py --eval_mode dssd --task gsm8k ...``"""

from duodecoding_tpu.cli import main

if __name__ == "__main__":
    main()
