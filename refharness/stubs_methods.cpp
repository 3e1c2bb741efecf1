// Method stubs for gigablast infrastructure the parser chain links
// against but does not functionally need in a standalone harness:
// memory accounting (pass through to libc), logging (stderr), the
// event loop's cooperative yield (no-op), threads (single-threaded),
// and File (POSIX wrapper used by the Unicode table loader).
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cstdarg>
#include <cerrno>
#include <fcntl.h>
#include <unistd.h>
#include <sys/stat.h>

#include "Mem.h"
#include "Loop.h"
#include "Threads.h"
#include "File.h"
#include "Tagdb.h"
#undef malloc
#undef free
#undef realloc

// ----- logging -----
bool log(const char *fmt, ...) { return true; }
bool log(int32_t type, const char *fmt, ...) { return true; }
bool logf(int32_t type, const char *fmt, ...) { return true; }
char *mstrerror(int err) { return strerror(err); }

// ----- memory: straight to libc, no accounting -----
void *Mem::gbmalloc(int size, const char *note) { return malloc(size); }
void *Mem::gbrealloc(void *ptr, int oldSize, int newSize, const char *note) {
	return realloc(ptr, newSize);
}
void Mem::gbfree(void *ptr, int size, const char *note) { free(ptr); }
void Mem::addMem(void *mem, int32_t size, const char *note, char isnew) {}
bool Mem::rmMem(void *mem, int32_t size, const char *note) { return true; }

// ----- event loop / threads -----
void Loop::quickPoll(int32_t niceness, const char *caller, int32_t lineno) {}
bool Threads::amThread() { return false; }
bool Threads::call(char type, int32_t niceness, void *state,
                   void (*callback)(void *, ThreadEntry *),
                   void *(*startRoutine)(void *, ThreadEntry *)) { return false; }

// ----- File: POSIX wrapper (used by loadUnicodeTable) -----
File::File() { m_fd = -1; m_calledOpen = false; m_calledSet = false; }
File::~File() { close(); }
void File::set(char *dir, char *filename) {
	if (!dir) { set(filename); return; }
	char buf[1024];
	int dlen = strlen(dir);
	if (dlen > 0 && dir[dlen - 1] == '/')
		snprintf(buf, sizeof(buf), "%s%s", dir, filename);
	else
		snprintf(buf, sizeof(buf), "%s/%s", dir, filename);
	set(buf);
}
void File::set(char *filename) {
	strncpy(m_filename, filename, sizeof(m_filename) - 1);
	m_filename[sizeof(m_filename) - 1] = '\0';
	m_calledSet = true;
}
bool File::open(int flags, int permissions) {
	m_fd = ::open(m_filename, flags, permissions);
	m_calledOpen = (m_fd >= 0);
	return m_fd >= 0;
}
int File::read(void *buf, int32_t size, int32_t offset) {
	if (m_fd < 0) return -1;
	ssize_t n = (offset >= 0) ? ::pread(m_fd, buf, size, offset)
	                          : ::read(m_fd, buf, size);
	return (int)n;
}
bool File::close() {
	if (m_fd >= 0) { ::close(m_fd); m_fd = -1; }
	return true;
}
int32_t File::doesExist() {
	struct stat st;
	return (stat(m_filename, &st) == 0) ? 1 : 0;
}

// ----- misc free functions -----
mode_t getFileCreationFlags() { return S_IRUSR | S_IWUSR | S_IRGRP | S_IWGRP | S_IROTH; }

void gbqsort(void *base, size_t n, size_t itemSize,
             int (*cmp)(const void *, const void *), int niceness) {
	qsort(base, n, itemSize, cmp);
}

uint64_t getHighestLitBitValueLL(uint64_t bits) {
	if (bits == 0) return 0;
	uint64_t v = 1;
	while ((v << 1) <= bits && (v << 1) != 0) v <<= 1;
	return v;
}

// compression: not exercised by the parser chain
int gbcompress(unsigned char *dest, uint32_t *destLen,
               unsigned char *source, uint32_t sourceLen, int level) {
	fprintf(stderr, "gbcompress stub called\n"); abort();
}
int gbuncompress(unsigned char *dest, uint32_t *destLen,
                 unsigned char *source, uint32_t sourceLen) {
	fprintf(stderr, "gbuncompress stub called\n"); abort();
}

// tagdb: not exercised
void Tag::set(char *site, char *tagname, int32_t timestamp, char *user,
              int32_t ip, char *data, int32_t dsize) {}
