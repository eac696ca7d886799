def heideldiag(*a, **k):
    raise NotImplementedError
