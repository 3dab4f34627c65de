"""Task drivers: training, reconstruction, transfer, prediction."""
