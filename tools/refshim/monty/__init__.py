# Minimal stand-in for the `monty` dependency of the torch reference,
# used ONLY by tools/gen_golden.py to import /root/reference for golden
# value generation. Not part of the scae_tpu framework.
