"""Model layer: encoding circuits, quantum kernels, GP core."""
