# Submodules are imported lazily by consumers (meshanything_tpu.models.<x>)
# to keep import costs low and avoid circular imports while the package
# is under construction.
