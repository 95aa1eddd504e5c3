"""Host-side data layer: WSI pyramid IO, annotations, RSP triplet sampling,
dataset readers, and the prefetching host->device pipeline."""
