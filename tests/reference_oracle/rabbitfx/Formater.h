// RabbitFX stub: chunkListFormat + Reference live in FastxChunk.h.
#ifndef RTC_STUB_FORMATER_H
#define RTC_STUB_FORMATER_H
#include "FastxChunk.h"
#endif
