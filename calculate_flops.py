"""Top-level alias for the fusion-cost benchmark (reference surface:
`python calculate_flops.py`, reference calculate_flops.py:305-372).
Implementation lives in tools/flops.py."""

from tools.flops import main

if __name__ == "__main__":
    main()
