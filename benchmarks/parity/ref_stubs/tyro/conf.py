class _Marker:
    def __class_getitem__(cls, item):
        return item


class AvoidSubcommands(_Marker):
    pass


class FlagConversionOff(_Marker):
    pass


class _markers:
    class Marker:
        pass


def arg(**kwargs):
    return _Marker


class Suppress(_Marker):
    pass
